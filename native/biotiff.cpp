// biotiff — minimal multithreaded TIFF decoder for the bio_image_unet_tpu
// data path.
//
// The framework's training pipelines are file-per-tile on disk (the
// reference's documented data layout, bio_image_unet/unet/data.py:98-122);
// keeping a TPU fed means decoding thousands of small TIFFs per epoch.  This
// library parses the TIFF 6.0 subset the framework writes (little-endian,
// strip-based, raw or zlib/deflate, uint8/16/32, int8/16/32, float16/32/64,
// chunky planar) and decodes batches of files on a std::thread pool.
//
// C ABI (consumed via ctypes from bio_image_unet_tpu/native/__init__.py):
//   biotiff_probe(path, shape[4], &dtype_code)      -> 0 ok / negative error
//   biotiff_read(path, out, capacity)               -> 0 ok / negative error
//   biotiff_read_batch(paths, n, out, item_bytes, n_threads)
//                                                   -> 0 ok / first error
//   biotiff_write(path, data, dtype_code, n, h, w, c, level, rows_per_strip,
//                 n_threads, bigtiff)               -> 0 ok / negative error
//       multithreaded encoder: pages are split into row bands (strips),
//       deflate-compressed in parallel on a thread pool, then laid out
//       sequentially with per-page IFDs — the output is a standard
//       little-endian strip-based TIFF 6.0 readable by any TIFF reader.
//
// dtype codes: 1 u8, 2 u16, 3 u32, 4 i8, 5 i16, 6 i32, 7 f16, 8 f32, 9 f64.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int ERR_OPEN = -1;
constexpr int ERR_FORMAT = -2;
constexpr int ERR_UNSUPPORTED = -3;
constexpr int ERR_CAPACITY = -4;
constexpr int ERR_INFLATE = -5;
constexpr int ERR_INCONSISTENT = -6;

struct Tag {
    uint16_t id;
    uint16_t type;
    uint64_t count;
    uint64_t value_or_offset;  // raw inline bytes OR out-of-line offset
    bool big;                  // BigTIFF entry (8-byte inline area)
};

struct PageInfo {
    uint32_t width = 0, height = 0;
    uint16_t bits = 8, samples = 1, compression = 1, sample_format = 1;
    std::vector<uint64_t> strip_offsets;
    std::vector<uint64_t> strip_counts;
};

struct FileBuf {
    std::vector<uint8_t> data;
};

bool read_file(const char* path, FileBuf& buf) {
    FILE* fh = std::fopen(path, "rb");
    if (!fh) return false;
    std::fseek(fh, 0, SEEK_END);
    long size = std::ftell(fh);
    std::fseek(fh, 0, SEEK_SET);
    if (size < 8) { std::fclose(fh); return false; }
    buf.data.resize(static_cast<size_t>(size));
    size_t got = std::fread(buf.data.data(), 1, buf.data.size(), fh);
    std::fclose(fh);
    return got == buf.data.size();
}

uint16_t rd16(const uint8_t* p) { return static_cast<uint16_t>(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
    return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
           (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint64_t rd64(const uint8_t* p) {
    return static_cast<uint64_t>(rd32(p)) | (static_cast<uint64_t>(rd32(p + 4)) << 32);
}

int type_size(uint16_t t) {
    switch (t) {
        case 1: case 2: case 6: case 7: return 1;
        case 3: case 8: return 2;
        case 4: case 9: case 11: case 13: return 4;
        case 5: case 10: case 12: case 16: case 17: case 18: return 8;
        default: return 0;
    }
}

// Read tag values as uint64 (SHORT, LONG or BigTIFF LONG8).
bool tag_values(const FileBuf& f, const Tag& tag, std::vector<uint64_t>& out) {
    int ts = type_size(tag.type);
    if (ts == 0 || (tag.type != 3 && tag.type != 4 && tag.type != 16)) return false;
    if (tag.count > (1ull << 28)) return false;  // sanity
    size_t total = static_cast<size_t>(ts) * tag.count;
    size_t inline_cap = tag.big ? 8 : 4;
    const uint8_t* src;
    uint8_t inline_buf[8];
    if (total <= inline_cap) {
        std::memcpy(inline_buf, &tag.value_or_offset, 8);  // little-endian host
        src = inline_buf;
    } else {
        if (tag.value_or_offset > f.data.size() ||
            total > f.data.size() - tag.value_or_offset)
            return false;  // subtraction form: 64-bit sums must not wrap
        src = f.data.data() + tag.value_or_offset;
    }
    out.resize(tag.count);
    for (uint64_t i = 0; i < tag.count; ++i) {
        out[i] = (tag.type == 3) ? rd16(src + 2 * i)
               : (tag.type == 4) ? rd32(src + 4 * i)
                                 : rd64(src + 8 * i);
    }
    return true;
}

int dtype_code(uint16_t bits, uint16_t fmt) {
    if (fmt == 1) {  // unsigned
        if (bits == 8) return 1;
        if (bits == 16) return 2;
        if (bits == 32) return 3;
    } else if (fmt == 2) {  // signed
        if (bits == 8) return 4;
        if (bits == 16) return 5;
        if (bits == 32) return 6;
    } else if (fmt == 3) {  // float
        if (bits == 16) return 7;
        if (bits == 32) return 8;
        if (bits == 64) return 9;
    }
    return 0;
}

int parse_pages(const FileBuf& f, std::vector<PageInfo>& pages) {
    const auto& d = f.data;
    if (d.size() < 8 || d[0] != 'I' || d[1] != 'I')
        return ERR_FORMAT;  // big-endian TIFF routed to the Python fallback
    bool big;
    uint64_t off;
    if (rd16(&d[2]) == 42) {  // classic
        big = false;
        off = rd32(&d[4]);
    } else if (rd16(&d[2]) == 43 && d.size() >= 16 && rd16(&d[4]) == 8 &&
               rd16(&d[6]) == 0) {  // BigTIFF: 64-bit offsets
        big = true;
        off = rd64(&d[8]);
    } else {
        return ERR_FORMAT;
    }
    const uint64_t cnt_size = big ? 8 : 2;
    const uint64_t entry_size = big ? 20 : 12;
    const uint64_t next_size = big ? 8 : 4;
    size_t guard = 0;
    while (off && guard++ < 65536) {
        if (off > d.size() || cnt_size > d.size() - off) return ERR_FORMAT;
        uint64_t n = big ? rd64(&d[off]) : rd16(&d[off]);
        if (n > 65536) return ERR_FORMAT;  // sanity
        if (cnt_size + entry_size * n + next_size > d.size() - off)
            return ERR_FORMAT;  // (off <= size checked above; n <= 65536)
        PageInfo page;
        for (uint64_t i = 0; i < n; ++i) {
            const uint8_t* e = &d[off + cnt_size + entry_size * i];
            Tag tag{rd16(e), rd16(e + 2),
                    big ? rd64(e + 4) : rd32(e + 4),
                    big ? rd64(e + 12) : static_cast<uint64_t>(rd32(e + 8)),
                    big};
            std::vector<uint64_t> vals;
            switch (tag.id) {
                case 256: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.width = static_cast<uint32_t>(vals[0]); break;
                case 257: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.height = static_cast<uint32_t>(vals[0]); break;
                case 258: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.bits = static_cast<uint16_t>(vals[0]); break;
                case 259: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.compression = static_cast<uint16_t>(vals[0]); break;
                case 273: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.strip_offsets.assign(vals.begin(), vals.end()); break;
                case 277: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.samples = static_cast<uint16_t>(vals[0]); break;
                case 279: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.strip_counts.assign(vals.begin(), vals.end()); break;
                case 284: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          if (vals[0] != 1) return ERR_UNSUPPORTED; break;
                case 317: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          if (vals[0] != 1) return ERR_UNSUPPORTED; break;
                case 339: if (!tag_values(f, tag, vals)) return ERR_FORMAT;
                          page.sample_format = static_cast<uint16_t>(vals[0]); break;
                default: break;
            }
        }
        if (page.compression != 1 && page.compression != 8 && page.compression != 32946)
            return ERR_UNSUPPORTED;
        if (!page.width || !page.height || page.strip_offsets.empty() ||
            page.strip_offsets.size() != page.strip_counts.size())
            return ERR_FORMAT;
        if (dtype_code(page.bits, page.sample_format) == 0) return ERR_UNSUPPORTED;
        pages.push_back(std::move(page));
        const uint8_t* next = &d[off + cnt_size + entry_size * n];
        off = big ? rd64(next) : rd32(next);
    }
    return pages.empty() ? ERR_FORMAT : 0;
}

int decode_page(const FileBuf& f, const PageInfo& page, uint8_t* out,
                size_t out_bytes) {
    size_t expect = static_cast<size_t>(page.width) * page.height *
                    page.samples * (page.bits / 8);
    if (expect > out_bytes) return ERR_CAPACITY;
    size_t written = 0;
    for (size_t s = 0; s < page.strip_offsets.size(); ++s) {
        uint64_t off = page.strip_offsets[s];
        uint64_t cnt = page.strip_counts[s];
        if (off > f.data.size() || cnt > f.data.size() - off)
            return ERR_FORMAT;  // subtraction form: no uint64 wrap
        const uint8_t* src = f.data.data() + off;
        if (page.compression == 1) {
            if (written + cnt > expect) return ERR_FORMAT;
            std::memcpy(out + written, src, cnt);
            written += cnt;
        } else {  // deflate
            uLongf dest_len = static_cast<uLongf>(expect - written);
            int rc = uncompress(out + written, &dest_len, src,
                                static_cast<uLong>(cnt));
            if (rc != Z_OK) return ERR_INFLATE;
            written += dest_len;
        }
    }
    return written == expect ? 0 : ERR_FORMAT;
}

int read_one(const char* path, uint8_t* out, int64_t capacity,
             int64_t shape_out[4], int* dtype_out) {
    FileBuf f;
    if (!read_file(path, f)) return ERR_OPEN;
    std::vector<PageInfo> pages;
    int rc = parse_pages(f, pages);
    if (rc != 0) return rc;
    const PageInfo& p0 = pages[0];
    int dt = dtype_code(p0.bits, p0.sample_format);
    size_t page_bytes = static_cast<size_t>(p0.width) * p0.height * p0.samples *
                        (p0.bits / 8);
    size_t total = page_bytes * pages.size();
    if (shape_out) {
        shape_out[0] = static_cast<int64_t>(pages.size());
        shape_out[1] = p0.height;
        shape_out[2] = p0.width;
        shape_out[3] = p0.samples;
    }
    if (dtype_out) *dtype_out = dt;
    if (out == nullptr) return 0;  // probe-only
    if (static_cast<int64_t>(total) > capacity) return ERR_CAPACITY;
    for (size_t i = 0; i < pages.size(); ++i) {
        const PageInfo& p = pages[i];
        if (p.width != p0.width || p.height != p0.height ||
            p.samples != p0.samples || p.bits != p0.bits ||
            p.sample_format != p0.sample_format)
            return ERR_INCONSISTENT;
        int rc2 = decode_page(f, p, out + i * page_bytes, page_bytes);
        if (rc2 != 0) return rc2;
    }
    return 0;
}

}  // namespace

extern "C" {

int biotiff_probe(const char* path, int64_t shape_out[4], int* dtype_out) {
    return read_one(path, nullptr, 0, shape_out, dtype_out);
}

int biotiff_read(const char* path, uint8_t* out, int64_t capacity,
                 int64_t shape_out[4], int* dtype_out) {
    return read_one(path, out, capacity, shape_out, dtype_out);
}

// Decode n equal-shaped files in parallel into one contiguous buffer.
// Every file must decode to exactly (expected_shape, expected_dtype) — a
// smaller file would otherwise fill only part of its slot and leave
// uninitialized bytes that read as silently corrupt data downstream.
int biotiff_read_batch(const char** paths, int n, uint8_t* out,
                       int64_t item_bytes, int n_threads,
                       const int64_t expected_shape[4], int expected_dtype) {
    if (n <= 0) return 0;
    std::atomic<int> next{0};
    std::atomic<int> first_error{0};
    int workers = n_threads > 0 ? n_threads : 4;
    if (workers > n) workers = n;

    auto work = [&]() {
        int64_t shape[4];
        int dtype;
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n || first_error.load() != 0) return;
            int rc = read_one(paths[i], out + static_cast<int64_t>(i) * item_bytes,
                              item_bytes, shape, &dtype);
            if (rc == 0 && expected_shape != nullptr) {
                if (dtype != expected_dtype ||
                    shape[0] != expected_shape[0] || shape[1] != expected_shape[1] ||
                    shape[2] != expected_shape[2] || shape[3] != expected_shape[3])
                    rc = ERR_INCONSISTENT;
            }
            if (rc != 0) {
                int expected = 0;
                first_error.compare_exchange_strong(expected, rc);
                return;
            }
        }
    };
    std::vector<std::thread> threads;
    threads.reserve(workers);
    for (int i = 0; i < workers; ++i) threads.emplace_back(work);
    for (auto& t : threads) t.join();
    return first_error.load();
}

// ---------------------------------------------------------------------------
// encoder
// ---------------------------------------------------------------------------

int biotiff_write(const char* path, const void* data, int dtype_code,
                  int64_t n_frames, int64_t h, int64_t w, int64_t c,
                  int compress_level, int rows_per_strip, int n_threads,
                  int bigtiff) {
    struct Fmt { int bytes; uint16_t bits; uint16_t fmt; };
    Fmt fmt{};
    switch (dtype_code) {
        case 1: fmt = {1, 8, 1}; break;
        case 2: fmt = {2, 16, 1}; break;
        case 3: fmt = {4, 32, 1}; break;
        case 4: fmt = {1, 8, 2}; break;
        case 5: fmt = {2, 16, 2}; break;
        case 6: fmt = {4, 32, 2}; break;
        case 7: fmt = {2, 16, 3}; break;
        case 8: fmt = {4, 32, 3}; break;
        case 9: fmt = {8, 64, 3}; break;
        default: return ERR_UNSUPPORTED;
    }
    if (n_frames <= 0 || h <= 0 || w <= 0 || c <= 0) return ERR_FORMAT;
    const auto* base = static_cast<const uint8_t*>(data);
    const int64_t row_bytes = w * c * fmt.bytes;
    const int64_t frame_bytes = h * row_bytes;

    if (compress_level <= 0 || rows_per_strip <= 0 || rows_per_strip > h)
        rows_per_strip = compress_level > 0 ? 64 : static_cast<int>(h);
    const int64_t strips_per_frame = (h + rows_per_strip - 1) / rows_per_strip;
    const int64_t n_strips = n_frames * strips_per_frame;

    // compress all strips on a thread pool (raw spans when level 0)
    std::vector<std::vector<uint8_t>> compressed;
    if (compress_level > 0) {
        compressed.resize(static_cast<size_t>(n_strips));
        std::atomic<int64_t> next{0};
        std::atomic<int> first_error{0};
        int workers = n_threads > 0 ? n_threads
            : static_cast<int>(std::thread::hardware_concurrency());
        if (workers < 1) workers = 4;
        if (workers > n_strips) workers = static_cast<int>(n_strips);
        auto work = [&]() {
            while (true) {
                int64_t i = next.fetch_add(1);
                if (i >= n_strips || first_error.load() != 0) return;
                const int64_t frame = i / strips_per_frame;
                const int64_t strip = i % strips_per_frame;
                const int64_t row0 = strip * rows_per_strip;
                const int64_t rows = std::min<int64_t>(rows_per_strip, h - row0);
                const uint8_t* src = base + frame * frame_bytes + row0 * row_bytes;
                const uLong src_len = static_cast<uLong>(rows * row_bytes);
                uLongf cap = compressBound(src_len);
                auto& out = compressed[static_cast<size_t>(i)];
                out.resize(cap);
                int rc = compress2(out.data(), &cap, src, src_len, compress_level);
                if (rc != Z_OK) { first_error.store(ERR_INFLATE); return; }
                out.resize(cap);
            }
        };
        std::vector<std::thread> threads;
        threads.reserve(static_cast<size_t>(workers));
        for (int i = 0; i < workers; ++i) threads.emplace_back(work);
        for (auto& t : threads) t.join();
        if (first_error.load() != 0) return first_error.load();
    }

    FILE* fh = std::fopen(path, "wb");
    if (!fh) return ERR_OPEN;
    auto wr = [&](const void* p, size_t nbytes) {
        return std::fwrite(p, 1, nbytes, fh) == nbytes;
    };
    auto put16 = [](std::vector<uint8_t>& v, uint16_t x) {
        v.push_back(static_cast<uint8_t>(x)); v.push_back(static_cast<uint8_t>(x >> 8));
    };
    auto put32 = [](std::vector<uint8_t>& v, uint32_t x) {
        for (int i = 0; i < 4; ++i) v.push_back(static_cast<uint8_t>(x >> (8 * i)));
    };
    auto put64 = [](std::vector<uint8_t>& v, uint64_t x) {
        for (int i = 0; i < 8; ++i) v.push_back(static_cast<uint8_t>(x >> (8 * i)));
    };

    const bool big = bigtiff != 0;  // BigTIFF: 64-bit offsets, no 4 GiB cap
    uint64_t pos, prev_link;
    if (big) {
        const uint8_t header[16] = {'I', 'I', 43, 0, 8, 0, 0, 0,
                                    0, 0, 0, 0, 0, 0, 0, 0};
        if (!wr(header, 16)) { std::fclose(fh); return ERR_OPEN; }
        pos = 16;
        prev_link = 8;
    } else {
        const uint8_t header[8] = {'I', 'I', 42, 0, 0, 0, 0, 0};
        if (!wr(header, 8)) { std::fclose(fh); return ERR_OPEN; }
        pos = 8;
        prev_link = 4;  // where to patch the next-IFD pointer
    }
    const uint64_t cnt_size = big ? 8 : 2;     // IFD entry-count field
    const uint64_t entry_size = big ? 20 : 12;
    const size_t inline_cap = big ? 8 : 4;

    for (int64_t frame = 0; frame < n_frames; ++frame) {
        // strip data
        std::vector<uint64_t> offs, cnts;
        for (int64_t strip = 0; strip < strips_per_frame; ++strip) {
            if (pos % 2) { uint8_t z = 0; wr(&z, 1); ++pos; }
            const uint8_t* p;
            size_t nbytes;
            if (compress_level > 0) {
                auto& buf = compressed[static_cast<size_t>(
                    frame * strips_per_frame + strip)];
                p = buf.data(); nbytes = buf.size();
            } else {
                p = base + frame * frame_bytes;
                nbytes = static_cast<size_t>(frame_bytes);
            }
            // classic TIFF carries 32-bit offsets; past 4 GiB they would
            // silently wrap into a corrupt file — refuse instead (the
            // caller auto-promotes to BigTIFF or surfaces the error)
            if (!big && pos + nbytes > UINT32_MAX) {
                std::fclose(fh);
                std::remove(path);
                return ERR_CAPACITY;
            }
            offs.push_back(pos);
            cnts.push_back(nbytes);
            if (!wr(p, nbytes)) { std::fclose(fh); return ERR_OPEN; }
            pos += nbytes;
        }

        // IFD (entries ascending by tag; too-big payloads deferred after it)
        struct Entry { uint16_t tag, type; std::vector<uint8_t> payload; uint64_t count; };
        std::vector<Entry> entries;
        auto add = [&](uint16_t tag, uint16_t type,
                       const std::vector<uint64_t>& values) {
            Entry e{tag, type, {}, values.size()};
            for (uint64_t v : values) {
                if (type == 3) put16(e.payload, static_cast<uint16_t>(v));
                else if (type == 4) put32(e.payload, static_cast<uint32_t>(v));
                else put64(e.payload, v);  // LONG8
            }
            entries.push_back(std::move(e));
        };
        const uint16_t SHORT_ = 3, LONG_ = 4, LONG8_ = 16;
        const uint16_t OFF_ = big ? LONG8_ : LONG_;
        add(256, LONG_, {static_cast<uint64_t>(w)});
        add(257, LONG_, {static_cast<uint64_t>(h)});
        add(258, SHORT_, std::vector<uint64_t>(c, fmt.bits));
        add(259, SHORT_, {compress_level > 0 ? 8ull : 1ull});
        add(262, SHORT_, {1});  // BlackIsZero
        add(273, OFF_, offs);
        add(277, SHORT_, {static_cast<uint64_t>(c)});
        add(278, LONG_, {static_cast<uint64_t>(rows_per_strip)});
        add(279, OFF_, cnts);
        if (c > 1) add(284, SHORT_, {1});  // chunky
        add(339, SHORT_, std::vector<uint64_t>(c, fmt.fmt));

        if (pos % 2) { uint8_t z = 0; wr(&z, 1); ++pos; }
        const uint64_t ifd_offset = pos;
        const size_t n_entries = entries.size();
        const uint64_t value_area =
            ifd_offset + cnt_size + entry_size * n_entries + (big ? 8 : 4);
        std::vector<uint8_t> ifd, deferred;
        if (big) put64(ifd, n_entries); else put16(ifd, static_cast<uint16_t>(n_entries));
        for (auto& e : entries) {
            put16(ifd, e.tag); put16(ifd, e.type);
            if (big) put64(ifd, e.count); else put32(ifd, static_cast<uint32_t>(e.count));
            if (e.payload.size() <= inline_cap) {
                auto p = e.payload; p.resize(inline_cap, 0);
                ifd.insert(ifd.end(), p.begin(), p.end());
            } else {
                if (deferred.size() % 2) deferred.push_back(0);
                if (big) put64(ifd, value_area + deferred.size());
                else put32(ifd, static_cast<uint32_t>(value_area + deferred.size()));
                deferred.insert(deferred.end(), e.payload.begin(), e.payload.end());
            }
        }
        if (big) put64(ifd, 0); else put32(ifd, 0);  // next IFD — patched later
        if (!big && ifd_offset + ifd.size() + deferred.size() > UINT32_MAX) {
            std::fclose(fh);
            std::remove(path);
            return ERR_CAPACITY;  // IFD past the classic-TIFF 32-bit limit
        }
        if (!wr(ifd.data(), ifd.size()) ||
            (!deferred.empty() && !wr(deferred.data(), deferred.size()))) {
            std::fclose(fh); return ERR_OPEN;
        }
        pos += ifd.size() + deferred.size();

        // link previous IFD (or header) to this one
        std::fseek(fh, static_cast<long>(prev_link), SEEK_SET);
        std::vector<uint8_t> link_le;
        if (big) put64(link_le, ifd_offset); else put32(link_le, static_cast<uint32_t>(ifd_offset));
        if (!wr(link_le.data(), link_le.size())) { std::fclose(fh); return ERR_OPEN; }
        std::fseek(fh, 0, SEEK_END);
        prev_link = ifd_offset + cnt_size + entry_size * n_entries;
    }
    // stdio buffers flush at close: an ENOSPC/EIO surfacing there must not
    // report success (the caller would keep a silently corrupt file)
    if (std::fclose(fh) != 0) {
        std::remove(path);
        return ERR_OPEN;
    }
    return 0;
}

}  // extern "C"
