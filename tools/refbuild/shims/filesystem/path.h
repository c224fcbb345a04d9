// Shim for wjakob/filesystem path.h, API subset used by the pbrt-v4
// reference (util/file.cpp:30-105), backed by std::filesystem (C++17).
#ifndef FILESYSTEM_PATH_SHIM_H
#define FILESYSTEM_PATH_SHIM_H

#include <filesystem>
#include <string>

namespace filesystem {

class path {
  public:
    path() = default;
    path(const std::string &s) : p_(s) {}
    path(const char *s) : p_(s) {}
    path(const std::filesystem::path &p) : p_(p) {}

    bool empty() const { return p_.empty(); }
    bool exists() const {
        std::error_code ec;
        return std::filesystem::exists(p_, ec);
    }
    bool is_directory() const {
        std::error_code ec;
        return std::filesystem::is_directory(p_, ec);
    }
    bool is_absolute() const { return p_.is_absolute(); }
    path parent_path() const { return path(p_.parent_path()); }
    // wjakob extension() returns the extension WITHOUT the leading dot
    std::string extension() const {
        std::string e = p_.extension().string();
        if (!e.empty() && e[0] == '.') e.erase(0, 1);
        return e;
    }
    std::string filename() const { return p_.filename().string(); }
    path make_absolute() const {
        std::error_code ec;
        auto a = std::filesystem::absolute(p_, ec);
        return path(ec ? p_ : a);
    }
    std::string str() const { return p_.string(); }
    path operator/(const path &other) const { return path(p_ / other.p_); }

  private:
    std::filesystem::path p_;
};

}  // namespace filesystem

#endif
