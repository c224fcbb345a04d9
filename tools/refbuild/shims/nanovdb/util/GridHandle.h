// Shim: see ../NanoVDB.h for scope.
#ifndef NANOVDB_GRIDHANDLE_SHIM_H
#define NANOVDB_GRIDHANDLE_SHIM_H

#include <nanovdb/NanoVDB.h>

namespace nanovdb {

template <typename BufferT>
class GridHandle {
  public:
    GridHandle() = default;
    GridHandle(const GridHandle &) = delete;
    GridHandle &operator=(const GridHandle &) = delete;
    GridHandle(GridHandle &&other) noexcept = default;
    GridHandle &operator=(GridHandle &&other) noexcept = default;

    explicit operator bool() const { return false; }  // stub: never loaded
    template <typename ValueT>
    const NanoGrid<ValueT> *grid() const { return nullptr; }
    const GridMetaData *gridMetaData() const { return &meta_; }

  private:
    GridMetaData meta_;
};

}  // namespace nanovdb

#endif
