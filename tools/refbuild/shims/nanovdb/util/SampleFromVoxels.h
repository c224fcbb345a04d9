// Shim: SampleFromVoxels lives in ../NanoVDB.h.
#ifndef NANOVDB_SAMPLEFROMVOXELS_SHIM_H
#define NANOVDB_SAMPLEFROMVOXELS_SHIM_H

#include <nanovdb/NanoVDB.h>

#endif
