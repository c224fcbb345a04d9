// Minimal PNG codec backing the lodepng shim header (see lodepng.h).
// Decode: non-interlaced PNG, all five color types, 1/2/4/8/16 bpc,
// palette + tRNS, converted to the caller-requested format (16-bit output
// big-endian, as PNG and the lodepng API convention). Encode: filter-0
// scanlines + zlib. CRC via zlib's crc32.
#include "lodepng.h"

#include <zlib.h>

#include <cstring>
#include <string>

namespace {

// error codes (text only; numbering is shim-local)
enum {
    OK = 0,
    E_SIG = 28,
    E_CHUNK = 30,
    E_IHDR = 31,
    E_COLOR = 32,
    E_INTERLACE = 33,
    E_ZLIB = 34,
    E_FILTER = 36,
    E_NOMEM = 83,
    E_PARAM = 84,
    E_TRUNC = 85,
};

unsigned rd32(const unsigned char *p) {
    return ((unsigned)p[0] << 24) | ((unsigned)p[1] << 16) |
           ((unsigned)p[2] << 8) | (unsigned)p[3];
}

void wr32(unsigned char *p, unsigned v) {
    p[0] = (unsigned char)(v >> 24);
    p[1] = (unsigned char)(v >> 16);
    p[2] = (unsigned char)(v >> 8);
    p[3] = (unsigned char)v;
}

int channels_of(LodePNGColorType t) {
    switch (t) {
    case LCT_GREY:
        return 1;
    case LCT_RGB:
        return 3;
    case LCT_PALETTE:
        return 1;
    case LCT_GREY_ALPHA:
        return 2;
    case LCT_RGBA:
        return 4;
    }
    return 0;
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

}  // namespace

void lodepng_state_init(LodePNGState *state) {
    state->info_png.color.colortype = LCT_RGBA;
    state->info_png.color.bitdepth = 8;
    state->info_png.interlace_method = 0;
}

const char *lodepng_error_text(unsigned code) {
    switch (code) {
    case OK:
        return "no error";
    case E_SIG:
        return "not a PNG (bad signature)";
    case E_CHUNK:
        return "corrupt chunk structure";
    case E_IHDR:
        return "invalid IHDR";
    case E_COLOR:
        return "unsupported color type / bit depth";
    case E_INTERLACE:
        return "Adam7 interlace unsupported in shim codec";
    case E_ZLIB:
        return "zlib (de)compression failed";
    case E_FILTER:
        return "invalid scanline filter";
    case E_NOMEM:
        return "out of memory";
    case E_PARAM:
        return "invalid parameters";
    case E_TRUNC:
        return "truncated PNG data";
    }
    return "unknown error";
}

unsigned lodepng_inspect(unsigned *w, unsigned *h, LodePNGState *state,
                         const unsigned char *in, size_t insize) {
    static const unsigned char sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (insize < 33) return E_TRUNC;
    if (memcmp(in, sig, 8) != 0) return E_SIG;
    if (rd32(in + 8) != 13 || memcmp(in + 12, "IHDR", 4) != 0) return E_IHDR;
    *w = rd32(in + 16);
    *h = rd32(in + 20);
    state->info_png.color.bitdepth = in[24];
    state->info_png.color.colortype = (LodePNGColorType)in[25];
    state->info_png.interlace_method = in[28];
    if (*w == 0 || *h == 0) return E_IHDR;
    return OK;
}

unsigned lodepng_decode_memory(std::vector<unsigned char> &out, unsigned *w,
                               unsigned *h, const unsigned char *in,
                               size_t insize, LodePNGColorType colortype,
                               unsigned bitdepth) {
    LodePNGState st;
    lodepng_state_init(&st);
    unsigned err = lodepng_inspect(w, h, &st, in, insize);
    if (err) return err;
    if (st.info_png.interlace_method != 0) return E_INTERLACE;
    unsigned W = *w, H = *h;
    unsigned sbd = st.info_png.color.bitdepth;
    LodePNGColorType sct = st.info_png.color.colortype;
    int sch = channels_of(sct);
    if (sch == 0) return E_COLOR;
    if (sct == LCT_PALETTE && sbd > 8) return E_COLOR;
    if ((sct == LCT_RGB || sct == LCT_GREY_ALPHA || sct == LCT_RGBA) &&
        sbd < 8)
        return E_COLOR;

    // walk chunks: collect IDAT, PLTE, tRNS
    std::vector<unsigned char> idat;
    std::vector<unsigned char> plte;   // rgb triples
    std::vector<unsigned char> trns;   // palette alpha
    size_t pos = 8;
    while (pos + 8 <= insize) {
        unsigned len = rd32(in + pos);
        if (pos + 12 + (size_t)len > insize) return E_TRUNC;
        const char *type = (const char *)in + pos + 4;
        const unsigned char *data = in + pos + 8;
        if (memcmp(type, "IDAT", 4) == 0)
            idat.insert(idat.end(), data, data + len);
        else if (memcmp(type, "PLTE", 4) == 0)
            plte.assign(data, data + len);
        else if (memcmp(type, "tRNS", 4) == 0)
            trns.assign(data, data + len);
        else if (memcmp(type, "IEND", 4) == 0)
            break;
        pos += 12 + len;
    }
    if (idat.empty()) return E_TRUNC;

    // inflate
    size_t bpp_bits = (size_t)sch * sbd;                 // bits per pixel
    size_t stride = (W * bpp_bits + 7) / 8;              // bytes per scanline
    size_t rawsize = (stride + 1) * H;
    std::vector<unsigned char> raw(rawsize);
    uLongf rawlen = (uLongf)rawsize;
    int zr = uncompress(raw.data(), &rawlen, idat.data(), (uLong)idat.size());
    if (zr != Z_OK || rawlen != rawsize) return E_ZLIB;

    // unfilter in place -> packed scanlines
    std::vector<unsigned char> px(stride * H);
    size_t fbytes = (bpp_bits + 7) / 8;  // filter byte distance
    for (unsigned y = 0; y < H; ++y) {
        unsigned char ft = raw[y * (stride + 1)];
        const unsigned char *src = raw.data() + y * (stride + 1) + 1;
        unsigned char *dst = px.data() + y * stride;
        const unsigned char *up = y ? px.data() + (y - 1) * stride : nullptr;
        for (size_t x = 0; x < stride; ++x) {
            int a = x >= fbytes ? dst[x - fbytes] : 0;
            int b = up ? up[x] : 0;
            int c = (up && x >= fbytes) ? up[x - fbytes] : 0;
            int v = src[x];
            switch (ft) {
            case 0:
                break;
            case 1:
                v += a;
                break;
            case 2:
                v += b;
                break;
            case 3:
                v += (a + b) / 2;
                break;
            case 4:
                v += paeth(a, b, c);
                break;
            default:
                return E_FILTER;
            }
            dst[x] = (unsigned char)v;
        }
    }

    // per-pixel source -> RGBA16 -> requested format
    int och = channels_of(colortype);
    if (och == 0 || colortype == LCT_PALETTE) return E_PARAM;
    size_t obytes = (bitdepth == 16) ? 2 : 1;
    out.assign((size_t)W * H * och * obytes, 0);

    auto sample_bits = [&](const unsigned char *row, size_t idx,
                           unsigned bits) -> unsigned {
        // idx'th value of `bits` width in a packed big-endian row
        size_t bitpos = idx * bits;
        unsigned v = 0;
        for (unsigned k = 0; k < bits; ++k) {
            size_t bp = bitpos + k;
            v = (v << 1) | ((row[bp >> 3] >> (7 - (bp & 7))) & 1);
        }
        return v;
    };

    unsigned maxv = (sbd >= 8) ? ((sbd == 16) ? 65535 : 255)
                               : ((1u << sbd) - 1);
    for (unsigned y = 0; y < H; ++y) {
        const unsigned char *row = px.data() + y * stride;
        for (unsigned x = 0; x < W; ++x) {
            unsigned r16, g16, b16, a16 = 65535;
            if (sct == LCT_PALETTE) {
                unsigned i = sample_bits(row, x, sbd);
                if (3 * i + 2 < plte.size()) {
                    r16 = plte[3 * i] * 257;
                    g16 = plte[3 * i + 1] * 257;
                    b16 = plte[3 * i + 2] * 257;
                } else
                    r16 = g16 = b16 = 0;
                if (i < trns.size()) a16 = trns[i] * 257;
            } else {
                unsigned vals[4];
                for (int c = 0; c < sch; ++c) {
                    if (sbd == 16)
                        vals[c] = ((unsigned)row[(x * sch + c) * 2] << 8) |
                                  row[(x * sch + c) * 2 + 1];
                    else if (sbd == 8)
                        vals[c] = row[x * sch + c];
                    else
                        vals[c] = sample_bits(row, x * sch + c, sbd);
                    // scale to 16 bit
                    vals[c] = (unsigned)((unsigned long)vals[c] * 65535 /
                                         maxv);
                }
                if (sct == LCT_GREY) {
                    r16 = g16 = b16 = vals[0];
                } else if (sct == LCT_GREY_ALPHA) {
                    r16 = g16 = b16 = vals[0];
                    a16 = vals[1];
                } else if (sct == LCT_RGB) {
                    r16 = vals[0];
                    g16 = vals[1];
                    b16 = vals[2];
                } else {  // RGBA
                    r16 = vals[0];
                    g16 = vals[1];
                    b16 = vals[2];
                    a16 = vals[3];
                }
            }
            unsigned ov[4];
            int n = 0;
            if (colortype == LCT_GREY) {
                ov[n++] = r16;  // callers only request GREY for grey PNGs
            } else if (colortype == LCT_GREY_ALPHA) {
                ov[n++] = r16;
                ov[n++] = a16;
            } else if (colortype == LCT_RGB) {
                ov[n++] = r16;
                ov[n++] = g16;
                ov[n++] = b16;
            } else {
                ov[n++] = r16;
                ov[n++] = g16;
                ov[n++] = b16;
                ov[n++] = a16;
            }
            unsigned char *o =
                out.data() + ((size_t)y * W + x) * och * obytes;
            for (int c = 0; c < n; ++c) {
                if (bitdepth == 16) {
                    o[2 * c] = (unsigned char)(ov[c] >> 8);
                    o[2 * c + 1] = (unsigned char)(ov[c] & 0xff);
                } else {
                    o[c] = (unsigned char)(ov[c] >> 8);
                }
            }
        }
    }
    return OK;
}

unsigned lodepng_encode_memory(unsigned char **out, size_t *outsize,
                               const unsigned char *image, unsigned w,
                               unsigned h, LodePNGColorType colortype,
                               unsigned bitdepth) {
    int ch = channels_of(colortype);
    if (ch == 0 || colortype == LCT_PALETTE ||
        (bitdepth != 8 && bitdepth != 16))
        return E_PARAM;
    size_t stride = (size_t)w * ch * (bitdepth / 8);
    std::vector<unsigned char> raw((stride + 1) * h);
    for (unsigned y = 0; y < h; ++y) {
        raw[y * (stride + 1)] = 0;  // filter 0
        memcpy(raw.data() + y * (stride + 1) + 1, image + y * stride,
               stride);
    }
    uLongf zcap = compressBound((uLong)raw.size());
    std::vector<unsigned char> z(zcap);
    if (compress2(z.data(), &zcap, raw.data(), (uLong)raw.size(), 6) != Z_OK)
        return E_ZLIB;

    size_t total = 8 + 25 + (12 + (size_t)zcap) + 12;
    unsigned char *buf = (unsigned char *)malloc(total);
    if (!buf) return E_NOMEM;
    unsigned char *p = buf;
    static const unsigned char sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    memcpy(p, sig, 8);
    p += 8;

    auto chunk = [&](const char *type, const unsigned char *data,
                     unsigned len) {
        wr32(p, len);
        memcpy(p + 4, type, 4);
        if (len) memcpy(p + 8, data, len);
        unsigned crc = crc32(0, p + 4, len + 4);
        wr32(p + 8 + len, crc);
        p += 12 + len;
    };

    unsigned char ihdr[13];
    wr32(ihdr, w);
    wr32(ihdr + 4, h);
    ihdr[8] = (unsigned char)bitdepth;
    ihdr[9] = (unsigned char)colortype;
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    chunk("IHDR", ihdr, 13);
    chunk("IDAT", z.data(), (unsigned)zcap);
    chunk("IEND", nullptr, 0);

    *out = buf;
    *outsize = (size_t)(p - buf);
    return OK;
}
