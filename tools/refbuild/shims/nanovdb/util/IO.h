// Shim: see ../NanoVDB.h for scope. readGrid throws so callers ErrorExit.
#ifndef NANOVDB_IO_SHIM_H
#define NANOVDB_IO_SHIM_H

#include <nanovdb/NanoVDB.h>
#include <nanovdb/util/GridHandle.h>

#include <stdexcept>
#include <string>

namespace nanovdb {
namespace io {

template <typename BufferT, typename... Args>
GridHandle<BufferT> readGrid(const std::string &, const std::string &,
                             int /*verbose*/, Args &&...) {
    throw std::runtime_error(
        ".nvdb volumes unsupported in the shim oracle build");
}

}  // namespace io
}  // namespace nanovdb

#endif
