// Shim: GPU-only header, never reached in the CPU oracle build.
#ifndef NANOVDB_CUDADEVICEBUFFER_SHIM_H
#define NANOVDB_CUDADEVICEBUFFER_SHIM_H
#endif
