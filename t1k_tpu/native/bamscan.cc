// Native BAM scanner: BGZF inflate + record field extraction in bulk.
//
// Replaces the per-record Python decode for the BAM extraction stage
// (reference alignments.hpp wraps samtools; this is the equivalent
// host-side native ingest without the vendored library).  Batches are
// returned as flat arrays: fixed-width int32 header fields plus byte
// blobs with offsets for names / decoded sequences / quals / two chosen
// string tags (cell barcode + UMI), and a 64-bit FNV name hash per
// record for fast mate-set membership tests.
//
// BAM layout: SAM spec v1.6 §4.2; BGZF: §4.1 (concatenated gzip
// members, handled by zlib with windowBits 15+16 and inflateReset at
// member boundaries).

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace t1kbam {

struct Scanner {
  FILE* fp = nullptr;
  z_stream zs{};
  std::vector<uint8_t> inBuf;
  std::vector<uint8_t> data;   // decompressed, rolling
  size_t dataPos = 0;
  bool eof = false;

  // header
  std::string headerText;
  std::vector<std::string> refNames;
  std::vector<int32_t> refLens;

  // current batch staging
  std::vector<int32_t> fields;   // [n, 9]
  std::vector<uint64_t> nameHash;
  std::vector<int64_t> nameOff, seqOff, qualOff, bcOff, umiOff;
  std::string names, seqs, quals, bcs, umis;
  char bcTag[3] = {0, 0, 0};
  char umiTag[3] = {0, 0, 0};
  int32_t trimLen = -1;  // -1: strip a trailing /1 or /2

  ~Scanner() {
    if (fp) fclose(fp);
    inflateEnd(&zs);
  }
};

static const char kNib[17] = "=ACMGRSVTWYHKDBN";

// Pull more decompressed bytes; returns false at end of stream.
static bool Refill(Scanner& s) {
  if (s.eof) return false;
  // compact consumed prefix
  if (s.dataPos > (1 << 20)) {
    s.data.erase(s.data.begin(), s.data.begin() + s.dataPos);
    s.dataPos = 0;
  }
  uint8_t out[1 << 16];
  for (int round = 0; round < 64; ++round) {
    if (s.zs.avail_in == 0) {
      size_t got = fread(s.inBuf.data(), 1, s.inBuf.size(), s.fp);
      if (got == 0) {
        s.eof = true;
        return s.data.size() > s.dataPos;
      }
      s.zs.next_in = s.inBuf.data();
      s.zs.avail_in = (uInt)got;
    }
    s.zs.next_out = out;
    s.zs.avail_out = sizeof(out);
    int rc = inflate(&s.zs, Z_NO_FLUSH);
    size_t produced = sizeof(out) - s.zs.avail_out;
    s.data.insert(s.data.end(), out, out + produced);
    if (rc == Z_STREAM_END) {
      inflateReset(&s.zs);  // next BGZF member
    } else if (rc != Z_OK && rc != Z_BUF_ERROR) {
      s.eof = true;
      return s.data.size() > s.dataPos;
    }
    if (s.data.size() - s.dataPos > (1 << 18)) return true;
  }
  return true;
}

static bool Need(Scanner& s, size_t n) {
  while (s.data.size() - s.dataPos < n) {
    if (!Refill(s)) return false;
  }
  return true;
}

static int32_t RdI32(Scanner& s) {
  int32_t v;
  std::memcpy(&v, s.data.data() + s.dataPos, 4);
  s.dataPos += 4;
  return v;
}

}  // namespace t1kbam

extern "C" {

void* t1k_bam_open2(const char* path, const char* bc_tag,
                    const char* umi_tag, int32_t trim_len) {
  auto* s = new t1kbam::Scanner();
  s->fp = fopen(path, "rb");
  if (!s->fp) {
    delete s;
    return nullptr;
  }
  s->inBuf.resize(1 << 20);
  inflateInit2(&s->zs, 15 + 16);
  s->trimLen = trim_len;
  if (bc_tag && bc_tag[0]) std::memcpy(s->bcTag, bc_tag, 2);
  if (umi_tag && umi_tag[0]) std::memcpy(s->umiTag, umi_tag, 2);

  if (!t1kbam::Need(*s, 12)) {
    delete s;
    return nullptr;
  }
  if (std::memcmp(s->data.data() + s->dataPos, "BAM\x01", 4) != 0) {
    delete s;
    return nullptr;
  }
  s->dataPos += 4;
  int32_t lText = t1kbam::RdI32(*s);
  if (!t1kbam::Need(*s, (size_t)lText + 4)) {
    delete s;
    return nullptr;
  }
  s->headerText.assign((const char*)s->data.data() + s->dataPos, lText);
  s->dataPos += lText;
  int32_t nRef = t1kbam::RdI32(*s);
  for (int i = 0; i < nRef; ++i) {
    if (!t1kbam::Need(*s, 4)) break;
    int32_t lName = t1kbam::RdI32(*s);
    if (!t1kbam::Need(*s, (size_t)lName + 4)) break;
    s->refNames.emplace_back((const char*)s->data.data() + s->dataPos,
                             lName - 1);
    s->dataPos += lName;
    s->refLens.push_back(t1kbam::RdI32(*s));
  }
  return s;
}

void t1k_bam_close(void* h) { delete static_cast<t1kbam::Scanner*>(h); }

int32_t t1k_bam_n_refs(void* h) {
  return (int32_t)static_cast<t1kbam::Scanner*>(h)->refNames.size();
}

const char* t1k_bam_ref_name(void* h, int32_t i) {
  return static_cast<t1kbam::Scanner*>(h)->refNames[i].c_str();
}

int32_t t1k_bam_ref_len(void* h, int32_t i) {
  return static_cast<t1kbam::Scanner*>(h)->refLens[i];
}

const char* t1k_bam_header_text(void* h) {
  return static_cast<t1kbam::Scanner*>(h)->headerText.c_str();
}

// Scan up to max_records records into the staging batch.  Returns the
// record count (0 at end of file).  Header fields per record:
// [flag, tid, pos, mapq, mtid, mpos, tlen, l_seq, ref_span].
int64_t t1k_bam_scan(void* h, int64_t max_records) {
  auto& s = *static_cast<t1kbam::Scanner*>(h);
  s.fields.clear();
  s.nameHash.clear();
  s.nameOff.assign(1, 0);
  s.seqOff.assign(1, 0);
  s.qualOff.assign(1, 0);
  s.bcOff.assign(1, 0);
  s.umiOff.assign(1, 0);
  s.names.clear();
  s.seqs.clear();
  s.quals.clear();
  s.bcs.clear();
  s.umis.clear();

  int64_t n = 0;
  while (n < max_records) {
    if (!t1kbam::Need(s, 4)) break;
    int32_t blockSize;
    std::memcpy(&blockSize, s.data.data() + s.dataPos, 4);
    if (!t1kbam::Need(s, (size_t)blockSize + 4)) break;
    s.dataPos += 4;
    const uint8_t* d = s.data.data() + s.dataPos;
    s.dataPos += blockSize;

    int32_t tid, pos, mtid, mpos, tlen, lSeq;
    uint32_t flagNC;
    std::memcpy(&tid, d, 4);
    std::memcpy(&pos, d + 4, 4);
    uint32_t binMqNl;
    std::memcpy(&binMqNl, d + 8, 4);
    std::memcpy(&flagNC, d + 12, 4);
    std::memcpy(&lSeq, d + 16, 4);
    std::memcpy(&mtid, d + 20, 4);
    std::memcpy(&mpos, d + 24, 4);
    std::memcpy(&tlen, d + 28, 4);
    int lReadName = binMqNl & 0xFF;
    int mapq = (binMqNl >> 8) & 0xFF;
    int nCigar = flagNC & 0xFFFF;
    int flag = flagNC >> 16;

    size_t off = 32;
    const char* name = (const char*)d + off;
    int nameLen = lReadName - 1;
    // hash over the mate-trimmed name so both mates share the key
    int hashLen = nameLen;
    if (s.trimLen == -1) {
      if (nameLen >= 2 && name[nameLen - 2] == '/' &&
          (name[nameLen - 1] == '1' || name[nameLen - 1] == '2'))
        hashLen = nameLen - 2;
    } else if (s.trimLen > 0 && s.trimLen <= nameLen) {
      hashLen = nameLen - s.trimLen;
    }
    uint64_t hsh = 1469598103934665603ull;
    for (int i = 0; i < hashLen; ++i)
      hsh = (hsh ^ (uint8_t)name[i]) * 1099511628211ull;
    off += lReadName;

    int32_t refSpan = 0;
    for (int i = 0; i < nCigar; ++i) {
      uint32_t v;
      std::memcpy(&v, d + off + 4 * i, 4);
      int op = v & 0xF;
      // M I D N S H P = X -> consumes reference: M D N = X
      if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
        refSpan += v >> 4;
    }
    off += 4 * (size_t)nCigar;

    size_t seqBase = s.seqs.size();
    s.seqs.resize(seqBase + lSeq);
    const uint8_t* packed = d + off;
    for (int i = 0; i < lSeq; ++i) {
      uint8_t b = packed[i >> 1];
      s.seqs[seqBase + i] =
          t1kbam::kNib[(i & 1) ? (b & 0xF) : (b >> 4)];
    }
    off += (lSeq + 1) / 2;

    size_t qualBase = s.quals.size();
    if (lSeq && d[off] != 0xFF) {
      s.quals.resize(qualBase + lSeq);
      for (int i = 0; i < lSeq; ++i)
        s.quals[qualBase + i] = (char)(d[off + i] + 33);
    }
    off += lSeq;

    // aux tags: harvest the requested Z tags, skip the rest
    while (off + 3 <= (size_t)blockSize) {
      char t0 = d[off], t1 = d[off + 1], typ = d[off + 2];
      off += 3;
      if (typ == 'Z' || typ == 'H') {
        size_t end = off;
        while (end < (size_t)blockSize && d[end] != 0) ++end;
        if (t0 == s.bcTag[0] && t1 == s.bcTag[1])
          s.bcs.append((const char*)d + off, end - off);
        else if (t0 == s.umiTag[0] && t1 == s.umiTag[1])
          s.umis.append((const char*)d + off, end - off);
        off = end + 1;
      } else if (typ == 'A' || typ == 'c' || typ == 'C') {
        off += 1;
      } else if (typ == 's' || typ == 'S') {
        off += 2;
      } else if (typ == 'i' || typ == 'I' || typ == 'f') {
        off += 4;
      } else if (typ == 'B') {
        uint8_t sub = d[off];
        int32_t cnt;
        std::memcpy(&cnt, d + off + 1, 4);
        int sz = (sub == 'c' || sub == 'C') ? 1
                 : (sub == 's' || sub == 'S') ? 2
                                              : 4;
        off += 5 + (size_t)cnt * sz;
      } else {
        break;
      }
    }

    const int32_t row[9] = {flag, tid, pos, mapq, mtid,
                            mpos, tlen, lSeq, refSpan};
    s.fields.insert(s.fields.end(), row, row + 9);
    s.nameHash.push_back(hsh);
    s.names.append(name, nameLen);
    s.nameOff.push_back((int64_t)s.names.size());
    s.seqOff.push_back((int64_t)s.seqs.size());
    s.qualOff.push_back((int64_t)s.quals.size());
    s.bcOff.push_back((int64_t)s.bcs.size());
    s.umiOff.push_back((int64_t)s.umis.size());
    ++n;
  }
  return n;
}

// Batch accessors (valid until the next t1k_bam_scan call).
const int32_t* t1k_bam_fields(void* h) {
  return static_cast<t1kbam::Scanner*>(h)->fields.data();
}
const uint64_t* t1k_bam_name_hashes(void* h) {
  return static_cast<t1kbam::Scanner*>(h)->nameHash.data();
}
const int64_t* t1k_bam_offsets(void* h, int32_t which) {
  auto& s = *static_cast<t1kbam::Scanner*>(h);
  switch (which) {
    case 0: return s.nameOff.data();
    case 1: return s.seqOff.data();
    case 2: return s.qualOff.data();
    case 3: return s.bcOff.data();
    default: return s.umiOff.data();
  }
}
const char* t1k_bam_blob(void* h, int32_t which, int64_t* len) {
  auto& s = *static_cast<t1kbam::Scanner*>(h);
  const std::string* b;
  switch (which) {
    case 0: b = &s.names; break;
    case 1: b = &s.seqs; break;
    case 2: b = &s.quals; break;
    case 3: b = &s.bcs; break;
    default: b = &s.umis; break;
  }
  *len = (int64_t)b->size();
  return b->data();
}

}  // extern "C"
