// Shim for stb_image.h: pbrt-v4 uses stbi_load (TGA/BMP/JPG byte images,
// util/image.cpp:890) and stbi_loadf (HDR radiance, :1699). The shim
// reports failure — those formats are unsupported in the oracle build;
// golden scenes use EXR/PFM textures.
#ifndef STBI_INCLUDE_STB_IMAGE_SHIM_H
#define STBI_INCLUDE_STB_IMAGE_SHIM_H

#ifdef __cplusplus
extern "C" {
#endif

typedef unsigned char stbi_uc;

extern stbi_uc *stbi_load(const char *filename, int *x, int *y,
                          int *channels_in_file, int desired_channels);
extern float *stbi_loadf(const char *filename, int *x, int *y,
                         int *channels_in_file, int desired_channels);
extern void stbi_image_free(void *retval_from_stbi_load);
extern const char *stbi_failure_reason(void);

#ifdef __cplusplus
}
#endif

#ifdef STB_IMAGE_IMPLEMENTATION
#include <stdlib.h>

extern "C" {

stbi_uc *stbi_load(const char *, int *x, int *y, int *n, int) {
    if (x) *x = 0;
    if (y) *y = 0;
    if (n) *n = 0;
    return 0;
}

float *stbi_loadf(const char *, int *x, int *y, int *n, int) {
    if (x) *x = 0;
    if (y) *y = 0;
    if (n) *n = 0;
    return 0;
}

void stbi_image_free(void *p) {
    free(p);
}

const char *stbi_failure_reason(void) {
    return "format unsupported in shim oracle build (use EXR/PFM/PNG)";
}

}  // extern "C"
#endif  // STB_IMAGE_IMPLEMENTATION

#endif
