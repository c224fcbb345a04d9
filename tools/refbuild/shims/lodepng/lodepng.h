// Shim for lodepng, API subset used by pbrt-v4 util/image.cpp:1255-1490
// (ReadPNG / WritePNG). Unlike the other shims this is a REAL minimal PNG
// codec backed by zlib: non-interlaced decode of grey/RGB/palette/
// grey-alpha/RGBA at 1/2/4/8/16 bpc with conversion to the requested
// format, and filter-0 encode of 8/16 bpc grey/RGB/RGBA — so PNG scene
// textures work in the oracle build.
#ifndef LODEPNG_SHIM_H
#define LODEPNG_SHIM_H

#include <cstddef>
#include <vector>

typedef enum LodePNGColorType {
    LCT_GREY = 0,
    LCT_RGB = 2,
    LCT_PALETTE = 3,
    LCT_GREY_ALPHA = 4,
    LCT_RGBA = 6
} LodePNGColorType;

typedef struct LodePNGColorMode {
    LodePNGColorType colortype;
    unsigned bitdepth;
} LodePNGColorMode;

typedef struct LodePNGInfo {
    LodePNGColorMode color;
    unsigned interlace_method;
} LodePNGInfo;

typedef struct LodePNGState {
    LodePNGInfo info_png;
} LodePNGState;

void lodepng_state_init(LodePNGState *state);

unsigned lodepng_inspect(unsigned *w, unsigned *h, LodePNGState *state,
                         const unsigned char *in, size_t insize);

const char *lodepng_error_text(unsigned code);

unsigned lodepng_decode_memory(std::vector<unsigned char> &out, unsigned *w,
                               unsigned *h, const unsigned char *in,
                               size_t insize, LodePNGColorType colortype,
                               unsigned bitdepth);

unsigned lodepng_encode_memory(unsigned char **out, size_t *outsize,
                               const unsigned char *image, unsigned w,
                               unsigned h, LodePNGColorType colortype,
                               unsigned bitdepth);

namespace lodepng {

inline unsigned decode(std::vector<unsigned char> &out, unsigned &w,
                       unsigned &h, const unsigned char *in, size_t insize,
                       LodePNGColorType colortype = LCT_RGBA,
                       unsigned bitdepth = 8) {
    return lodepng_decode_memory(out, &w, &h, in, insize, colortype,
                                 bitdepth);
}

}  // namespace lodepng

#endif
