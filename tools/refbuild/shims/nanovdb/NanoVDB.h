// Shim for NanoVDB, the compile-time API subset used by pbrt-v4
// media.h:540-680 / media.cpp:485-640. nanovdb::io::readGrid always
// throws, so NanoVDBMedium::Create ErrorExits — .nvdb volumes are
// unsupported in the oracle build (goldens use uniformgrid media). The
// grid/tree/sampler types below exist only so those translation units
// compile; none of their methods are reachable at runtime.
#ifndef NANOVDB_SHIM_H
#define NANOVDB_SHIM_H

#include <algorithm>
#include <cstdint>

namespace nanovdb {

template <typename T>
class Vec3 {
  public:
    Vec3() : v_{0, 0, 0} {}
    Vec3(T x, T y, T z) : v_{x, y, z} {}
    T operator[](int i) const { return v_[i]; }
    T &operator[](int i) { return v_[i]; }

  private:
    T v_[3];
};

using Vec3R = Vec3<double>;

class Coord {
  public:
    Coord() : v_{0, 0, 0} {}
    Coord(int x, int y, int z) : v_{x, y, z} {}
    int operator[](int i) const { return v_[i]; }

  private:
    int v_[3];
};

template <typename VecT>
class BBox {
  public:
    const VecT &min() const { return mn_; }
    const VecT &max() const { return mx_; }

  private:
    VecT mn_, mx_;
};

using CoordBBox = BBox<Coord>;

template <typename ValueT>
class NanoTree {
  public:
    using ValueType = ValueT;
    void extrema(ValueT &mn, ValueT &mx) const { mn = mx = ValueT(0); }
};

template <typename ValueT>
class DefaultReadAccessor {
  public:
    ValueT getValue(const Coord &) const { return ValueT(0); }
};

template <typename ValueT>
class NanoGrid {
  public:
    using TreeType = NanoTree<ValueT>;
    template <typename T>
    Vec3<T> worldToIndexF(const Vec3<T> &p) const { return p; }
    const TreeType &tree() const { return tree_; }
    BBox<Vec3R> worldBBox() const { return {}; }
    CoordBBox indexBBox() const { return {}; }
    DefaultReadAccessor<ValueT> getAccessor() const { return {}; }

  private:
    TreeType tree_;
};

using FloatGrid = NanoGrid<float>;

class GridMetaData {
  public:
    bool isFogVolume() const { return true; }
    bool isUnknown() const { return false; }
    uint64_t activeVoxelCount() const { return 0; }
};

// Sampler: TreeT, interpolation order, cache flag (media.h:628)
template <typename TreeT, int Order, bool UseCache>
class SampleFromVoxels {
  public:
    SampleFromVoxels(const TreeT &) {}
    template <typename VecT>
    typename TreeT::ValueType operator()(const VecT &) const {
        return typename TreeT::ValueType(0);
    }
};

}  // namespace nanovdb

#endif
