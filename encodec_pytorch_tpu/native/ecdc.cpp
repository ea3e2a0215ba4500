// ecdc.cpp — native hot loops for the .ecdc bitstream.
//
// Byte-exact C++ implementations of the per-symbol loops in
// encodec_pytorch_tpu/bitstream/{binary.py,ac.py} (reference semantics:
// /root/reference/binary.py, /root/reference/quantization/ac.py).
//
// Exactness argument: the arithmetic coder's integers stay < 2^62 (the
// reference asserts max_bit <= 61) and the effective-range products stay
// < 2^53, so IEEE doubles reproduce CPython float math bit-for-bit and the
// produced bytes are identical to the Python implementation. Tests assert
// cross-implementation byte equality.
//
// Build: g++ -O3 -fPIC -shared ecdc.cpp -o libecdc.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ------------------------------------------------------------- bit packing

// Pack n values of `bits` width LSB-first. Writes complete bytes to `out`
// (caller guarantees capacity >= (n*bits)/8 + 8) and returns the byte count;
// the residual partial byte is returned via tail_value/tail_bits.
size_t ecdc_pack_bits(const int32_t* values, size_t n, int bits,
                      uint8_t* out, uint64_t* tail_value, int* tail_bits) {
    uint64_t cur = 0;
    int cur_bits = 0;
    size_t written = 0;
    for (size_t i = 0; i < n; ++i) {
        cur |= (uint64_t)(uint32_t)values[i] << cur_bits;
        cur_bits += bits;
        while (cur_bits >= 8) {
            out[written++] = (uint8_t)(cur & 0xff);
            cur >>= 8;
            cur_bits -= 8;
        }
    }
    *tail_value = cur;
    *tail_bits = cur_bits;
    return written;
}

// Unpack up to max_out values of `bits` width from `data`. Returns the count
// produced (== floor(nbytes*8/bits), capped at max_out).
size_t ecdc_unpack_bits(const uint8_t* data, size_t nbytes, int bits,
                        int32_t* out, size_t max_out) {
    uint64_t cur = 0;
    int cur_bits = 0;
    const uint64_t mask = (1ull << bits) - 1;
    size_t produced = 0;
    size_t pos = 0;
    while (produced < max_out) {
        while (cur_bits < bits) {
            if (pos >= nbytes) return produced;
            cur |= (uint64_t)data[pos++] << cur_bits;
            cur_bits += 8;
        }
        out[produced++] = (int32_t)(cur & mask);
        cur >>= bits;
        cur_bits -= bits;
    }
    return produced;
}

// -------------------------------------------------------- arithmetic coder

struct AcEncoder {
    int total_range_bits;
    int64_t low = 0, high = 0;
    int max_bit = -1;
    // width-1 BitPacker state
    uint64_t pack_value = 0;
    int pack_bits = 0;
    std::vector<uint8_t> out;

    void push_bit(int b) {
        pack_value |= (uint64_t)b << pack_bits;
        pack_bits += 1;
        if (pack_bits >= 8) {
            out.push_back((uint8_t)(pack_value & 0xff));
            pack_value >>= 8;
            pack_bits -= 8;
        }
    }

    void flush_common_prefix() {
        while (max_bit >= 0) {
            int64_t b1 = low >> max_bit;
            int64_t b2 = high >> max_bit;
            if (b1 == b2) {
                low -= (b1 << max_bit);
                high -= (b1 << max_bit);
                max_bit -= 1;
                push_bit((int)b1);
            } else {
                break;
            }
        }
    }

    void push(int symbol, const int64_t* cdf) {
        const int64_t one = 1;
        while (high - low + 1 < (one << total_range_bits)) {
            low *= 2;
            high = high * 2 + 1;
            max_bit += 1;
        }
        int64_t range_low = symbol == 0 ? 0 : cdf[symbol - 1];
        int64_t range_high = cdf[symbol] - 1;
        double scale = (double)(high - low + 1) / (double)(one << total_range_bits);
        int64_t effective_low = (int64_t)std::ceil((double)range_low * scale);
        int64_t effective_high = (int64_t)std::floor((double)range_high * scale);
        high = low + effective_high;
        low = low + effective_low;
        flush_common_prefix();
    }

    void flush() {
        while (max_bit >= 0) {
            push_bit((int)((low >> max_bit) & 1));
            max_bit -= 1;
        }
        if (pack_bits) {
            out.push_back((uint8_t)(pack_value & 0xff));
            pack_value = 0;
            pack_bits = 0;
        }
    }
};

void* ecdc_ac_encoder_new(int total_range_bits) {
    auto* enc = new AcEncoder();
    enc->total_range_bits = total_range_bits;
    return enc;
}

void ecdc_ac_encoder_push(void* p, int symbol, const int64_t* cdf) {
    ((AcEncoder*)p)->push(symbol, cdf);
}

// push a [n_steps] symbol sequence against [n_steps, card] CDFs
void ecdc_ac_encoder_push_batch(void* p, const int32_t* symbols,
                                const int64_t* cdfs, size_t n_steps,
                                size_t card) {
    auto* enc = (AcEncoder*)p;
    for (size_t t = 0; t < n_steps; ++t)
        enc->push(symbols[t], cdfs + t * card);
}

size_t ecdc_ac_encoder_flush_size(void* p) {
    auto* enc = (AcEncoder*)p;
    enc->flush();
    return enc->out.size();
}

void ecdc_ac_encoder_copy(void* p, uint8_t* dst) {
    auto* enc = (AcEncoder*)p;
    std::memcpy(dst, enc->out.data(), enc->out.size());
}

void ecdc_ac_encoder_free(void* p) { delete (AcEncoder*)p; }

struct AcDecoder {
    int total_range_bits;
    int64_t low = 0, high = 0, current = 0;
    int max_bit = -1;
    // width-1 BitUnpacker state
    const uint8_t* data;
    size_t nbytes, pos = 0;
    uint64_t un_value = 0;
    int un_bits = 0;

    int pull_bit() {
        if (un_bits < 1) {
            if (pos >= nbytes) return -1;
            un_value |= (uint64_t)data[pos++] << un_bits;
            un_bits += 8;
        }
        int out = (int)(un_value & 1);
        un_value >>= 1;
        un_bits -= 1;
        return out;
    }

    void flush_common_prefix() {
        while (max_bit >= 0) {
            int64_t b1 = low >> max_bit;
            int64_t b2 = high >> max_bit;
            if (b1 == b2) {
                low -= (b1 << max_bit);
                high -= (b1 << max_bit);
                current -= (b1 << max_bit);
                max_bit -= 1;
            } else {
                break;
            }
        }
    }

    // returns symbol, or -1 at end of stream, or -2 on search failure
    int pull(const int64_t* cdf, size_t card) {
        const int64_t one = 1;
        while (high - low + 1 < (one << total_range_bits)) {
            int bit = pull_bit();
            if (bit < 0) return -1;
            low *= 2;
            high = high * 2 + 1;
            current = current * 2 + bit;
            max_bit += 1;
        }
        double scale = (double)(high - low + 1) / (double)(one << total_range_bits);
        long low_idx = 0, high_idx = (long)card - 1;
        while (true) {
            if (high_idx < low_idx) return -2;
            long mid = (low_idx + high_idx) / 2;
            int64_t range_low = mid > 0 ? cdf[mid - 1] : 0;
            int64_t range_high = cdf[mid] - 1;
            int64_t lo = (int64_t)std::ceil((double)range_low * scale) + low;
            int64_t hi = (int64_t)std::floor((double)range_high * scale) + low;
            if (current >= lo) {
                if (current <= hi) {
                    low = lo;
                    high = hi;
                    flush_common_prefix();
                    return (int)mid;
                } else {
                    low_idx = mid + 1;
                }
            } else {
                high_idx = mid - 1;
            }
        }
    }
};

void* ecdc_ac_decoder_new(const uint8_t* data, size_t nbytes,
                          int total_range_bits) {
    auto* dec = new AcDecoder();
    dec->total_range_bits = total_range_bits;
    dec->data = data;
    dec->nbytes = nbytes;
    return dec;
}

int ecdc_ac_decoder_pull(void* p, const int64_t* cdf, size_t card) {
    return ((AcDecoder*)p)->pull(cdf, card);
}

// decode n_steps symbols against [n_steps, card] CDFs; returns count decoded
size_t ecdc_ac_decoder_pull_batch(void* p, const int64_t* cdfs, size_t n_steps,
                                  size_t card, int32_t* out) {
    auto* dec = (AcDecoder*)p;
    for (size_t t = 0; t < n_steps; ++t) {
        int sym = dec->pull(cdfs + t * card, card);
        if (sym < 0) return t;
        out[t] = sym;
    }
    return n_steps;
}

void ecdc_ac_decoder_free(void* p) { delete (AcDecoder*)p; }

// ----------------------------------------------------------- quantized cdf

// pdf float32 [card] -> int64 cdf [card], matching
// build_stable_quantized_cdf (float32 roundoff floor + float32 scale).
void ecdc_build_cdf(const float* pdf, size_t card, int total_range_bits,
                    float roundoff, int min_range, int64_t* out) {
    double total_range = (double)(1ll << total_range_bits);
    double alpha = (double)min_range * (double)card / total_range;
    float scale = (float)((1.0 - alpha) * total_range);
    int64_t acc = 0;
    for (size_t i = 0; i < card; ++i) {
        float p = pdf[i];
        if (roundoff > 0)
            p = std::floor(p / roundoff) * roundoff;
        int64_t r = (int64_t)std::floor(scale * p) + min_range;
        acc += r;
        out[i] = acc;
    }
}

// [n, card] pdfs -> [n, card] cdfs in one call (the per-timestep K-codebook
// batch in the LM compression loop)
void ecdc_build_cdf_batch(const float* pdfs, size_t n, size_t card,
                          int total_range_bits, float roundoff, int min_range,
                          int64_t* out) {
    for (size_t i = 0; i < n; ++i)
        ecdc_build_cdf(pdfs + i * card, card, total_range_bits, roundoff,
                       min_range, out + i * card);
}

}  // extern "C"
