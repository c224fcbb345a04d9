// Replacement for pbrt util/gui.cpp in the shim oracle build: the
// interactive GLFW/OpenGL viewer is unsupported; every entry point
// ErrorExits. Batch rendering (the golden-image oracle use) never calls
// these.
#include <pbrt/util/gui.h>

#include <pbrt/util/check.h>
#include <pbrt/util/error.h>

namespace pbrt {

static RGB *stubFramebuffer = nullptr;

GUI::GUI(std::string, Vector2i resolution, Bounds3f) : resolution(resolution) {
    ErrorExit("--interactive is unsupported in the shim oracle build "
              "(GLFW/OpenGL not available).");
}

GUI::~GUI() {}

void GUI::Initialize() {}

Point2i GUI::GetResolution() {
    ErrorExit("--interactive is unsupported in the shim oracle build.");
    return Point2i(0, 0);
}

DisplayState GUI::RefreshDisplay() {
    return DisplayState::EXIT;
}

bool GUI::processKeys() {
    return false;
}

bool GUI::processMouse() {
    return false;
}

bool GUI::process() {
    return false;
}

void GUI::keyboardCallback(GLFWwindow *, int, int, int, int) {}
void GUI::cursorPosCallback(GLFWwindow *, double, double) {}
void GUI::mouseButtonCallback(GLFWwindow *, int, int, int) {}

}  // namespace pbrt
