// Shim for qoi.h: pbrt-v4 util/image.cpp uses qoi_encode/qoi_decode for
// the QOI format. The shim reports failure (QOI images unsupported in the
// oracle build; the golden pipeline is EXR-only).
#ifndef QOI_SHIM_H
#define QOI_SHIM_H

#include <cstddef>

#define QOI_SRGB 0
#define QOI_LINEAR 1

typedef struct {
    unsigned int width;
    unsigned int height;
    unsigned char channels;
    unsigned char colorspace;
} qoi_desc;

static inline void *qoi_encode(const void *, const qoi_desc *, int *out_len) {
    if (out_len) *out_len = 0;
    return nullptr;  // unsupported in shim build
}

static inline void *qoi_decode(const void *, int, qoi_desc *desc, int) {
    if (desc) { desc->width = desc->height = 0; }
    return nullptr;  // unsupported in shim build
}

#endif
