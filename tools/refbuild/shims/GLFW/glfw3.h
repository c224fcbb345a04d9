// Shim: GLFW types only, so util/gui.h's method signatures parse. The GUI
// implementation is replaced by gui_stub.cpp (interactive mode is
// unsupported in the oracle build).
#ifndef GLFW3_SHIM_H
#define GLFW3_SHIM_H

typedef struct GLFWwindow GLFWwindow;
typedef struct GLFWmonitor GLFWmonitor;

#endif
