// Shim for Ptexture.h (Disney ptex), API subset used by pbrt-v4
// textures.cpp:585-775. cache->get() always fails, so PtexTextureBase
// marks itself invalid and pbrt falls back to returning 0 with an Error —
// ptex textures are unsupported in the oracle build (goldens avoid them).
#ifndef PTEXTURE_SHIM_H
#define PTEXTURE_SHIM_H

#include <cstddef>
#include <cstdint>
#include <string>

class PtexErrorHandler {
  public:
    virtual ~PtexErrorHandler() {}
    virtual void reportError(const char *error) = 0;
};

class PtexInputHandler;

namespace Ptex {

class String {
  public:
    const char *c_str() const { return s_.c_str(); }
    operator const char *() const { return s_.c_str(); }
    void set(const char *s) { s_ = s; }

  private:
    std::string s_ = "ptex unsupported in shim oracle build";
};

class PtexTexture {
  public:
    struct Info {
        int numFaces = 0;
    };
    int numChannels() const { return 0; }
    Info getInfo() const { return {}; }
    void release() {}
};

class PtexFilter {
  public:
    enum FilterType { f_point, f_bilinear, f_box, f_gaussian, f_bicubic,
                      f_bspline, f_catmullrom, f_mitchell };
    struct Options {
        Options(FilterType ft, bool lerp_ = false, float sharpness_ = 0.f)
            : filter(ft), lerp(lerp_), sharpness(sharpness_) {}
        FilterType filter;
        bool lerp;
        float sharpness;
    };
    static PtexFilter *getFilter(PtexTexture *, const Options &) {
        return nullptr;
    }
    void eval(float *result, int, int nc, int, float, float, float, float,
              float, float) {
        for (int i = 0; i < nc; ++i) result[i] = 0.f;
    }
    void release() {}
};

class PtexCache {
  public:
    struct Stats {
        uint64_t memUsed = 0, peakMemUsed = 0, filesOpen = 0,
                 peakFilesOpen = 0, filesAccessed = 0, fileReopens = 0,
                 blockReads = 0;
    };
    static PtexCache *create(int /*maxFiles*/, size_t /*maxMem*/,
                             bool /*premultiply*/,
                             PtexInputHandler * = nullptr,
                             PtexErrorHandler * = nullptr) {
        static PtexCache c;
        return &c;
    }
    PtexTexture *get(const char *, String &err) {
        err.set("ptex unsupported in shim oracle build");
        return nullptr;
    }
    void getStats(Stats &s) { s = Stats(); }
};

}  // namespace Ptex

#endif
