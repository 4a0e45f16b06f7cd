// Range/arithmetic coder for the codec bitstream (C API, no Python deps).
//
// Behavioral reference: /root/reference/coder/{ArithmeticCoder,BitIoStream}.cpp
// (the Nayuki reference arithmetic coder, STATE_SIZE=32). The bitstream format
// is defined entirely by the (CDF table, symbol) sequence and this state
// machine; we keep the identical 32-bit integer semantics so streams are
// interchangeable with the reference coder in principle.
//
// Build: g++ -O3 -shared -fPIC -o libpcoder.so coder.cpp

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

namespace {

constexpr int kStateSize = 32;
constexpr uint64_t kMaxRange = 1ULL << kStateSize;
constexpr uint64_t kMask = kMaxRange - 1;
constexpr uint64_t kTopMask = kMaxRange >> 1;
constexpr uint64_t kSecondMask = kTopMask >> 1;

class BitWriter {
 public:
  void put(int bit) {
    cur_ = (cur_ << 1) | bit;
    if (++nbits_ == 8) {
      bytes_.push_back(static_cast<uint8_t>(cur_));
      cur_ = 0;
      nbits_ = 0;
    }
  }
  void finish() {
    while (nbits_ != 0) put(0);
  }
  const std::vector<uint8_t>& bytes() const { return bytes_; }

 private:
  std::vector<uint8_t> bytes_;
  int cur_ = 0;
  int nbits_ = 0;
};

class BitReader {
 public:
  explicit BitReader(std::vector<uint8_t> bytes) : bytes_(std::move(bytes)) {}
  // Returns 0 past the end of stream (the reference decoder zero-fills).
  int get() {
    if (pos_ >= bytes_.size()) return 0;
    int bit = (bytes_[pos_] >> (7 - nbits_)) & 1;
    if (++nbits_ == 8) {
      nbits_ = 0;
      ++pos_;
    }
    return bit;
  }

 private:
  std::vector<uint8_t> bytes_;
  size_t pos_ = 0;
  int nbits_ = 0;
};

class Encoder {
 public:
  void write(const int32_t* table, uint32_t symbol, uint32_t total) {
    uint64_t range = high_ - low_ + 1;
    uint64_t sym_low = static_cast<uint32_t>(table[symbol]);
    uint64_t sym_high = static_cast<uint32_t>(table[symbol + 1]);
    uint64_t new_low = low_ + sym_low * range / total;
    uint64_t new_high = low_ + sym_high * range / total - 1;
    low_ = new_low;
    high_ = new_high;
    while (((low_ ^ high_) & kTopMask) == 0) {
      int bit = static_cast<int>(low_ >> (kStateSize - 1));
      out_.put(bit);
      for (; underflow_ > 0; --underflow_) out_.put(bit ^ 1);
      low_ = (low_ << 1) & kMask;
      high_ = ((high_ << 1) & kMask) | 1;
    }
    while ((low_ & ~high_ & kSecondMask) != 0) {
      ++underflow_;
      low_ = (low_ << 1) & (kMask >> 1);
      high_ = ((high_ << 1) & (kMask >> 1)) | kTopMask | 1;
    }
  }
  void finish() {
    if (finished_) return;  // idempotent: buffer flush may retry with a
    finished_ = true;       // larger capacity after the size probe
    out_.put(1);
    out_.finish();
  }
  const std::vector<uint8_t>& bytes() const { return out_.bytes(); }

 private:
  uint64_t low_ = 0;
  uint64_t high_ = kMask;
  uint64_t underflow_ = 0;
  bool finished_ = false;
  BitWriter out_;
};

class Decoder {
 public:
  explicit Decoder(std::vector<uint8_t> bytes) : in_(std::move(bytes)) {
    for (int i = 0; i < kStateSize; ++i) code_ = (code_ << 1) | in_.get();
  }

  uint32_t read(const int32_t* table, uint32_t ncode, uint32_t total) {
    uint64_t range = high_ - low_ + 1;
    uint64_t offset = code_ - low_;
    uint64_t value = ((offset + 1) * total - 1) / range;
    // highest symbol with table[symbol] <= value
    uint32_t start = 0, end = ncode;
    while (end - start > 1) {
      uint32_t mid = (start + end) >> 1;
      if (static_cast<uint32_t>(table[mid]) > value)
        end = mid;
      else
        start = mid;
    }
    uint32_t symbol = start;

    uint64_t sym_low = static_cast<uint32_t>(table[symbol]);
    uint64_t sym_high = static_cast<uint32_t>(table[symbol + 1]);
    uint64_t new_low = low_ + sym_low * range / total;
    uint64_t new_high = low_ + sym_high * range / total - 1;
    low_ = new_low;
    high_ = new_high;
    while (((low_ ^ high_) & kTopMask) == 0) {
      code_ = ((code_ << 1) & kMask) | in_.get();
      low_ = (low_ << 1) & kMask;
      high_ = ((high_ << 1) & kMask) | 1;
    }
    while ((low_ & ~high_ & kSecondMask) != 0) {
      code_ = (code_ & kTopMask) | ((code_ << 1) & (kMask >> 1)) | in_.get();
      low_ = (low_ << 1) & (kMask >> 1);
      high_ = ((high_ << 1) & (kMask >> 1)) | kTopMask | 1;
    }
    return symbol;
  }

 private:
  BitReader in_;
  uint64_t low_ = 0;
  uint64_t high_ = kMask;
  uint64_t code_ = 0;
};

struct Session {
  std::string fname;
  Encoder* enc = nullptr;
  Decoder* dec = nullptr;
  ~Session() {
    delete enc;
    delete dec;
  }
};

std::vector<uint8_t> read_file(const std::string& fname) {
  std::vector<uint8_t> bytes;
  FILE* f = std::fopen(fname.c_str(), "rb");
  if (!f) return bytes;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  bytes.resize(static_cast<size_t>(n));
  if (n > 0 && std::fread(bytes.data(), 1, n, f) != static_cast<size_t>(n))
    bytes.clear();
  std::fclose(f);
  return bytes;
}

}  // namespace

extern "C" {

void* pcoder_create(const char* fname) {
  auto* s = new Session();
  s->fname = fname;
  return s;
}

void pcoder_destroy(void* h) { delete static_cast<Session*>(h); }

void pcoder_start_encoder(void* h) {
  auto* s = static_cast<Session*>(h);
  delete s->enc;
  s->enc = new Encoder();
}

// tables: (n, ncode+1) int32 CDF rows; per-row total is the last entry.
void pcoder_encodes(void* h, const int32_t* tables, int ncode,
                    const int32_t* symbols, int n) {
  auto* s = static_cast<Session*>(h);
  for (int i = 0; i < n; ++i) {
    const int32_t* row = tables + static_cast<int64_t>(i) * (ncode + 1);
    s->enc->write(row, static_cast<uint32_t>(symbols[i]),
                  static_cast<uint32_t>(row[ncode]));
  }
}

// ranges: (n, 3) int32 rows (sym_low, sym_high, total) -- the minimal
// per-symbol information the encoder state machine consumes; lets the device
// pre-gather CDF rows so the host transfer is 3 ints/symbol instead of 9.
void pcoder_encode_ranges(void* h, const int32_t* ranges, int n) {
  auto* s = static_cast<Session*>(h);
  for (int i = 0; i < n; ++i) {
    const int32_t* r = ranges + static_cast<int64_t>(i) * 3;
    const int32_t row[2] = {r[0], r[1]};
    s->enc->write(row, 0, static_cast<uint32_t>(r[2]));
  }
}

// packed: one uint32 per symbol, v = sym_low | ((sym_high - 1) << 16), with
// a fixed total. Valid because the CDF monotonic repair guarantees
// 0 <= low < high <= total = 65536 (entropy_gmm_table semantics), so both
// fields fit in 16 bits. Cuts the device->host transfer to 4 bytes/symbol.
void pcoder_encode_packed(void* h, const uint32_t* packed, int n,
                          int32_t total) {
  auto* s = static_cast<Session*>(h);
  for (int i = 0; i < n; ++i) {
    uint32_t v = packed[i];
    const int32_t row[2] = {static_cast<int32_t>(v & 0xFFFFu),
                            static_cast<int32_t>((v >> 16) + 1u)};
    s->enc->write(row, 0, static_cast<uint32_t>(total));
  }
}

// --- in-memory and multi-lane APIs (device-decodable stream support) ---

// Finish the encoder and copy the payload into out (capacity cap bytes).
// Returns the payload size; if it exceeds cap nothing is copied and the
// negated required size is returned.
long pcoder_end_encoder_buf(void* h, uint8_t* out, long cap) {
  auto* s = static_cast<Session*>(h);
  s->enc->finish();
  const auto& b = s->enc->bytes();
  long n = static_cast<long>(b.size());
  if (n > cap) return -n;
  if (n > 0) std::copy(b.begin(), b.end(), out);
  delete s->enc;
  s->enc = nullptr;
  return n;
}

void pcoder_start_decoder_buf(void* h, const uint8_t* data, long n) {
  auto* s = static_cast<Session*>(h);
  delete s->dec;
  s->dec = new Decoder(std::vector<uint8_t>(data, data + n));
}

// Encode L independent lanes. packed holds lane-concatenated
// (low | (high-1)<<16) words; lane l covers packed[offsets[l], offsets[l+1]).
// Each lane is a fresh arithmetic-coder stream (decodable in parallel by the
// on-device decoder). Lane byte blocks are written back to back into out;
// lane_nbytes[l] receives each block size. Returns the total byte count, or
// the negated required size if it exceeds cap.
long pcoder_encode_lanes(const uint32_t* packed, const int64_t* offsets,
                         int nlanes, int32_t total, uint8_t* out, long cap,
                         int32_t* lane_nbytes) {
  long written = 0;
  for (int l = 0; l < nlanes; ++l) {
    Encoder enc;
    for (int64_t i = offsets[l]; i < offsets[l + 1]; ++i) {
      uint32_t v = packed[i];
      const int32_t row[2] = {static_cast<int32_t>(v & 0xFFFFu),
                              static_cast<int32_t>((v >> 16) + 1u)};
      enc.write(row, 0, static_cast<uint32_t>(total));
    }
    enc.finish();
    const auto& b = enc.bytes();
    long n = static_cast<long>(b.size());
    lane_nbytes[l] = static_cast<int32_t>(n);
    if (written + n <= cap && n > 0)
      std::copy(b.begin(), b.end(), out + written);
    written += n;
  }
  return written <= cap ? written : -written;
}

long pcoder_end_encoder(void* h) {
  auto* s = static_cast<Session*>(h);
  s->enc->finish();
  const auto& b = s->enc->bytes();
  FILE* f = std::fopen(s->fname.c_str(), "wb");
  if (!f) return -1;
  if (!b.empty()) std::fwrite(b.data(), 1, b.size(), f);
  std::fclose(f);
  long n = static_cast<long>(b.size());
  delete s->enc;
  s->enc = nullptr;
  return n;
}

void pcoder_start_decoder(void* h) {
  auto* s = static_cast<Session*>(h);
  delete s->dec;
  s->dec = new Decoder(read_file(s->fname));
}

void pcoder_decodes(void* h, const int32_t* tables, int ncode, int n,
                    int32_t* out) {
  auto* s = static_cast<Session*>(h);
  for (int i = 0; i < n; ++i) {
    const int32_t* row = tables + static_cast<int64_t>(i) * (ncode + 1);
    out[i] = static_cast<int32_t>(
        s->dec->read(row, static_cast<uint32_t>(ncode),
                     static_cast<uint32_t>(row[ncode])));
  }
}

}  // extern "C"
