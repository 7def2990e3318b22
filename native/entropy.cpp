// Native entropy coder for quantized latent codes (int8), used by
// meanflow_audio_codec_tpu/ops/entropy.py via ctypes.
//
// Static-model byte rANS (range Asymmetric Numeral System), 32-bit state
// with 8-bit renormalization, scale_bits = 12. One frequency table per
// stream (256 x u16 = 512 bytes) fitted to the actual code histogram, so
// the coded size tracks the empirical entropy of the latents —
// peak-normalized scalar codes are strongly concentrated near zero and
// typically cost ~5-6 bits/symbol instead of the stored 8.
//
// Stream layout: [256 x u16 LE normalized freqs][u64 LE payload size]
// [payload bytes]. Symbols are codes + 128 (int8 -> u8). Encoding runs in
// reverse and the payload is reversed on write, so decode streams forward.
//
// The reference has no stored format at all (its latents stay float32
// activations); this is the missing-codec-half the TPU rebuild adds.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kScaleBits = 12;
constexpr uint32_t kScale = 1u << kScaleBits;     // total of the freq table
constexpr uint32_t kRansL = 1u << 23;             // state lower bound
constexpr int kNumSymbols = 256;
constexpr size_t kTableBytes = kNumSymbols * 2;
constexpr size_t kSizeBytes = 8;

// Normalize raw counts to sum exactly kScale with every present symbol
// getting freq >= 1. Absent symbols get 0 (they cannot occur in decode).
void normalize_freqs(const uint64_t* counts, uint64_t n, uint16_t* freqs) {
    if (n == 0) {
        std::memset(freqs, 0, kTableBytes);
        return;
    }
    uint32_t assigned = 0;
    int present = 0;
    for (int s = 0; s < kNumSymbols; ++s) {
        if (counts[s] == 0) { freqs[s] = 0; continue; }
        ++present;
        uint64_t f = (counts[s] * kScale) / n;
        if (f == 0) f = 1;
        if (f > kScale) f = kScale;
        freqs[s] = static_cast<uint16_t>(f);
        assigned += static_cast<uint32_t>(f);
    }
    // Fix the rounding drift by walking the largest-frequency symbols;
    // never push a present symbol below 1.
    while (assigned != kScale) {
        int best = -1;
        for (int s = 0; s < kNumSymbols; ++s) {
            if (freqs[s] == 0) continue;
            if (assigned > kScale && freqs[s] <= 1) continue;
            if (best < 0 || freqs[s] > freqs[best]) best = s;
        }
        if (best < 0) break;  // cannot happen: present <= kScale
        if (assigned > kScale) { --freqs[best]; --assigned; }
        else                   { ++freqs[best]; ++assigned; }
    }
    (void)present;
}

}  // namespace

extern "C" {

// Encode n int8 codes. Writes table + size + payload into out (capacity
// out_cap). Returns total bytes written, or -1 if out_cap is too small.
long long mac_entropy_encode(const int8_t* codes, long long n,
                             uint8_t* out, long long out_cap) {
    if (n < 0 || out_cap < 0) return -1;
    uint64_t counts[kNumSymbols] = {0};
    for (long long i = 0; i < n; ++i)
        ++counts[static_cast<uint8_t>(codes[i]) ^ 0x80u];

    uint16_t freqs[kNumSymbols];
    normalize_freqs(counts, static_cast<uint64_t>(n), freqs);
    uint32_t cum[kNumSymbols + 1];
    cum[0] = 0;
    for (int s = 0; s < kNumSymbols; ++s) cum[s + 1] = cum[s] + freqs[s];

    // rANS encodes in reverse symbol order; bytes come out low-first.
    std::vector<uint8_t> payload;
    payload.reserve(static_cast<size_t>(n) + 16);
    uint32_t x = kRansL;
    for (long long i = n - 1; i >= 0; --i) {
        const uint8_t s = static_cast<uint8_t>(codes[i]) ^ 0x80u;
        const uint32_t f = freqs[s];
        const uint32_t x_max = ((kRansL >> kScaleBits) << 8) * f;
        while (x >= x_max) {
            payload.push_back(static_cast<uint8_t>(x & 0xFF));
            x >>= 8;
        }
        x = ((x / f) << kScaleBits) + (x % f) + cum[s];
    }
    // Flush the final 4 state bytes (low-first like the loop).
    for (int i = 0; i < 4; ++i) {
        payload.push_back(static_cast<uint8_t>(x & 0xFF));
        x >>= 8;
    }

    const long long total = static_cast<long long>(
        kTableBytes + kSizeBytes + payload.size());
    if (total > out_cap) return -1;
    uint8_t* p = out;
    for (int s = 0; s < kNumSymbols; ++s) {
        p[0] = static_cast<uint8_t>(freqs[s] & 0xFF);
        p[1] = static_cast<uint8_t>(freqs[s] >> 8);
        p += 2;
    }
    const uint64_t psize = payload.size();
    for (int i = 0; i < 8; ++i) p[i] = static_cast<uint8_t>(psize >> (8 * i));
    p += 8;
    // Reverse so the decoder reads forward.
    for (size_t i = 0; i < payload.size(); ++i)
        p[i] = payload[payload.size() - 1 - i];
    return total;
}

// Decode exactly n codes from data (n_bytes long). Returns bytes
// consumed, or -1 on malformed input.
long long mac_entropy_decode(const uint8_t* data, long long n_bytes,
                             int8_t* codes, long long n) {
    if (n < 0 || n_bytes < static_cast<long long>(kTableBytes + kSizeBytes))
        return -1;
    uint16_t freqs[kNumSymbols];
    uint32_t cum[kNumSymbols + 1];
    const uint8_t* p = data;
    uint32_t total_freq = 0;
    for (int s = 0; s < kNumSymbols; ++s) {
        freqs[s] = static_cast<uint16_t>(p[0] | (p[1] << 8));
        total_freq += freqs[s];
        p += 2;
    }
    if (n > 0 && total_freq != kScale) return -1;
    cum[0] = 0;
    for (int s = 0; s < kNumSymbols; ++s) cum[s + 1] = cum[s] + freqs[s];
    // cum-to-symbol lookup (4096 entries).
    uint8_t slot2sym[kScale];
    for (int s = 0; s < kNumSymbols; ++s)
        for (uint32_t k = cum[s]; k < cum[s + 1]; ++k)
            slot2sym[k] = static_cast<uint8_t>(s);

    uint64_t psize = 0;
    for (int i = 0; i < 8; ++i) psize |= static_cast<uint64_t>(p[i]) << (8 * i);
    p += 8;
    const uint8_t* end = data + n_bytes;
    if (psize > static_cast<uint64_t>(end - p)) return -1;
    const uint8_t* pe = p + psize;

    if (n == 0) return static_cast<long long>(kTableBytes + kSizeBytes + psize);
    if (psize < 4) return -1;
    // Initial state: last 4 flushed bytes, written high-first after the
    // reversal (the encoder pushed them low-first at the payload tail).
    uint32_t x = 0;
    for (int i = 0; i < 4; ++i) x = (x << 8) | *p++;
    for (long long i = 0; i < n; ++i) {
        const uint32_t slot = x & (kScale - 1);
        const uint8_t s = slot2sym[slot];
        codes[i] = static_cast<int8_t>(s ^ 0x80u);
        x = freqs[s] * (x >> kScaleBits) + slot - cum[s];
        while (x < kRansL) {
            if (p >= pe) return -1;
            x = (x << 8) | *p++;
        }
    }
    return static_cast<long long>(kTableBytes + kSizeBytes + psize);
}

// Worst-case encoded size for n codes (raw + table + state flush slack).
long long mac_entropy_bound(long long n) {
    return static_cast<long long>(kTableBytes + kSizeBytes) + n * 2 + 64;
}

}  // extern "C"
