// Dump the reference samplers' raw sample streams as float bit patterns,
// for the bit-exactness gates in tests/test_sampler_bitexact.py.
//
// For each sampler: StartPixelSample(p, sampleIndex, 0), then D Get1D()
// calls; each value printed as %08x of its float32 bits. Output format:
//   sampler <name> spp <spp> res <w> <h>
//   <px> <py> <si> <hex0> <hex1> ... <hexD-1>
#include <pbrt/pbrt.h>
#include <pbrt/samplers.h>
#include <pbrt/options.h>
#include <cstdio>
#include <cstring>

using namespace pbrt;

template <typename S>
static void Dump(const char *name, S &s, int spp, Point2i res) {
    const int D = 8;
    int pxs[] = {0, 1, 7, 13, 33, 63};
    int sis[] = {0, 1, 5, 15};
    printf("sampler %s spp %d res %d %d\n", name, spp, res.x, res.y);
    for (int pi = 0; pi < 6; ++pi) {
        for (int sj = 0; sj < 4; ++sj) {
            Point2i p(pxs[pi], pxs[(pi + 2) % 6]);
            s.StartPixelSample(p, sis[sj], 0);
            printf("%d %d %d", p.x, p.y, sis[sj]);
            for (int d = 0; d < D; ++d) {
                Float v = s.Get1D();
                float f = (float)v;
                unsigned u;
                memcpy(&u, &f, 4);
                printf(" %08x", u);
            }
            printf("\n");
        }
    }
}

template <typename S>
static void Dump2D(const char *name, S &s, int spp, Point2i res) {
    const int D = 4;   // Get2D calls
    int pxs[] = {0, 1, 7, 13, 33, 63};
    int sis[] = {0, 1, 5, 15};
    printf("sampler %s spp %d res %d %d\n", name, spp, res.x, res.y);
    for (int pi = 0; pi < 6; ++pi) {
        for (int sj = 0; sj < 4; ++sj) {
            Point2i p(pxs[pi], pxs[(pi + 2) % 6]);
            s.StartPixelSample(p, sis[sj], 0);
            printf("%d %d %d", p.x, p.y, sis[sj]);
            for (int d = 0; d < D; ++d) {
                Point2f v = s.Get2D();
                float f0 = (float)v.x, f1 = (float)v.y;
                unsigned u0, u1;
                memcpy(&u0, &f0, 4);
                memcpy(&u1, &f1, 4);
                printf(" %08x %08x", u0, u1);
            }
            printf("\n");
        }
    }
}

int main() {
    PBRTOptions opt;
    opt.quiet = true;
    InitPBRT(opt);
    int spp = 16;
    Point2i res(64, 64);
    {
        ZSobolSampler s(spp, res, RandomizeStrategy::FastOwen, 0);
        Dump("zsobol", s, spp, res);
    }
    {
        HaltonSampler s(spp, res, RandomizeStrategy::PermuteDigits, 0);
        Dump("halton", s, spp, res);
    }
    {
        SobolSampler s(spp, res, RandomizeStrategy::FastOwen, 0);
        Dump("sobol", s, spp, res);
    }
    {
        IndependentSampler s(spp, 0);
        Dump("independent", s, spp, res);
    }
    {
        ZSobolSampler s(spp, res, RandomizeStrategy::FastOwen, 0);
        Dump2D("zsobol2d", s, spp, res);
    }
    return 0;
}
