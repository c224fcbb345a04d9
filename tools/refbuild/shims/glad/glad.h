// Shim: OpenGL loader header, only needed so util/gui.h parses. The GUI
// implementation is replaced by gui_stub.cpp (interactive mode is
// unsupported in the oracle build).
#ifndef GLAD_SHIM_H
#define GLAD_SHIM_H
#endif
