// Shim for google/double-conversion, API-compatible subset used by the
// pbrt-v4 reference sources (parser.cpp:126, util/print.cpp:16-36).
// Implemented on strtod/snprintf: identical parse semantics for the scene
// grammar (decimal + hex floats), shortest-roundtrip printing approximated
// by %.9g / %.17g re-parse refinement.
#ifndef DOUBLE_CONVERSION_SHIM_H
#define DOUBLE_CONVERSION_SHIM_H

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

namespace double_conversion {

class StringBuilder {
  public:
    StringBuilder(char *buf, int size) : buf_(buf), size_(size), pos_(0) {}
    void AddCharacter(char c) {
        if (pos_ < size_ - 1) buf_[pos_++] = c;
    }
    void AddString(const char *s) {
        while (*s) AddCharacter(*s++);
    }
    int position() const { return pos_; }
    char *Finalize() {
        buf_[pos_] = '\0';
        return buf_;
    }

  private:
    char *buf_;
    int size_;
    int pos_;
};

class DoubleToStringConverter {
  public:
    enum Flags { NO_FLAGS = 0 };
    DoubleToStringConverter(int /*flags*/, const char *inf, const char *nan,
                            char /*exp_char*/, int /*lo*/, int /*hi*/,
                            int /*lead*/, int /*trail*/)
        : inf_(inf), nan_(nan) {}

    bool ToShortest(double v, StringBuilder *b) const {
        return Emit(v, b, /*single=*/false);
    }
    bool ToShortestSingle(float v, StringBuilder *b) const {
        return Emit(v, b, /*single=*/true);
    }

  private:
    bool Emit(double v, StringBuilder *b, bool single) const {
        if (v != v) {
            b->AddString(nan_);
            return true;
        }
        if (v > 1.7976931348623157e308 || v < -1.7976931348623157e308) {
            if (v < 0) b->AddCharacter('-');
            b->AddString(inf_);
            return true;
        }
        char tmp[64];
        // find the shortest precision that round-trips
        int lo = single ? 6 : 15, hi = single ? 9 : 17;
        for (int prec = lo; prec <= hi; ++prec) {
            snprintf(tmp, sizeof(tmp), "%.*g", prec, v);
            double back = strtod(tmp, nullptr);
            if (single ? ((float)back == (float)v) : (back == v)) break;
        }
        b->AddString(tmp);
        return true;
    }
    const char *inf_;
    const char *nan_;
};

class StringToDoubleConverter {
  public:
    enum Flags { NO_FLAGS = 0, ALLOW_HEX = 1 };
    StringToDoubleConverter(int /*flags*/, double empty_value,
                            double junk_value, const char * /*inf*/,
                            const char * /*nan*/)
        : empty_(empty_value), junk_(junk_value) {}

    double StringToDouble(const char *s, int length,
                          int *processed_chars) const {
        // bounded copy: input token is not NUL-terminated
        char tmp[128];
        if (length >= (int)sizeof(tmp)) length = sizeof(tmp) - 1;
        memcpy(tmp, s, length);
        tmp[length] = '\0';
        if (length == 0) {
            *processed_chars = 0;
            return empty_;
        }
        char *end = nullptr;
        double v = strtod(tmp, &end);
        *processed_chars = (int)(end - tmp);
        if (end == tmp) return junk_;
        return v;
    }

    float StringToFloat(const char *s, int length, int *processed) const {
        return (float)StringToDouble(s, length, processed);
    }

  private:
    double empty_;
    double junk_;
};

}  // namespace double_conversion

#endif
