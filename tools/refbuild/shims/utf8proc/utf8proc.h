// Shim for utf8proc, API subset used by pbrt-v4 util/string.cpp:193-197
// (NormalizeUTF8). Passthrough: returns a malloc'd copy of the input
// (correct for ASCII / already-NFC input, which covers pbrt scene files).
#ifndef UTF8PROC_SHIM_H
#define UTF8PROC_SHIM_H

#include <cstdlib>
#include <cstring>

typedef unsigned char utf8proc_uint8_t;
typedef long utf8proc_ssize_t;
typedef enum { UTF8PROC_COMPOSE = (1 << 3) } utf8proc_option_t;

static inline utf8proc_ssize_t utf8proc_map(const unsigned char *str,
                                            utf8proc_ssize_t strlen_,
                                            utf8proc_uint8_t **dstptr,
                                            utf8proc_option_t /*options*/) {
    utf8proc_uint8_t *out =
        (utf8proc_uint8_t *)malloc((size_t)strlen_ + 1);
    if (!out) return -1;
    memcpy(out, str, (size_t)strlen_);
    out[strlen_] = 0;
    *dstptr = out;
    return strlen_;
}

static inline const char *utf8proc_errmsg(utf8proc_ssize_t /*errcode*/) {
    return "utf8proc shim error";
}

#endif
