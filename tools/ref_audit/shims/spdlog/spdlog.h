// Minimal spdlog-compatible shim so the reference CTranslate2 sources can
// be compiled in this environment (the vendored third_party/spdlog
// submodule is not populated and there is no network access).
//
// Covers exactly the API surface used by /root/reference/src (see
// logging.cc, utils.cc, models/model.cc, translator.cc, generator.cc):
// level enum, set/get_level, should_log, free info/debug/warn functions
// with sequential "{}" substitution, stderr_logger_mt, set_default_logger,
// logger::set_pattern.  This is NOT spdlog; it is a self-written stub that
// formats to stderr.
#pragma once

#include <atomic>
#include <functional>
#include <iostream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>

namespace spdlog {

namespace level {
enum level_enum {
  trace = 0,
  debug = 1,
  info = 2,
  warn = 3,
  err = 4,
  critical = 5,
  off = 6,
};
}  // namespace level

namespace detail {

inline std::atomic<int>& current_level() {
  static std::atomic<int> lvl{static_cast<int>(level::info)};
  return lvl;
}

inline std::mutex& log_mutex() {
  static std::mutex m;
  return m;
}

inline void format_to(std::ostringstream& os, const char* fmt) {
  os << fmt;
}

template <typename T, typename... Rest>
void format_to(std::ostringstream& os, const char* fmt, T&& value,
               Rest&&... rest) {
  for (const char* p = fmt; *p; ++p) {
    if (p[0] == '{' && p[1] == '}') {
      os << std::forward<T>(value);
      format_to(os, p + 2, std::forward<Rest>(rest)...);
      return;
    }
    os << *p;
  }
}

inline const char* level_name(level::level_enum lvl) {
  switch (lvl) {
    case level::trace: return "trace";
    case level::debug: return "debug";
    case level::info: return "info";
    case level::warn: return "warning";
    case level::err: return "error";
    case level::critical: return "critical";
    default: return "off";
  }
}

template <typename... Args>
void log(level::level_enum lvl, const char* fmt, Args&&... args) {
  if (static_cast<int>(lvl) < current_level().load())
    return;
  std::ostringstream os;
  format_to(os, fmt, std::forward<Args>(args)...);
  std::lock_guard<std::mutex> lock(log_mutex());
  std::cerr << "[ctranslate2] [" << level_name(lvl) << "] " << os.str()
            << std::endl;
}

}  // namespace detail

class logger {
public:
  explicit logger(std::string name) : _name(std::move(name)) {}
  void set_pattern(const std::string&) {}

private:
  std::string _name;
};

inline std::shared_ptr<logger> stderr_logger_mt(const std::string& name) {
  return std::make_shared<logger>(name);
}

inline void set_default_logger(std::shared_ptr<logger>) {}

inline void set_level(level::level_enum lvl) {
  detail::current_level().store(static_cast<int>(lvl));
}

inline level::level_enum get_level() {
  return static_cast<level::level_enum>(detail::current_level().load());
}

inline bool should_log(level::level_enum lvl) {
  return static_cast<int>(lvl) >= detail::current_level().load();
}

template <typename... Args>
void trace(const char* fmt, Args&&... args) {
  detail::log(level::trace, fmt, std::forward<Args>(args)...);
}

template <typename... Args>
void debug(const char* fmt, Args&&... args) {
  detail::log(level::debug, fmt, std::forward<Args>(args)...);
}

template <typename... Args>
void info(const char* fmt, Args&&... args) {
  detail::log(level::info, fmt, std::forward<Args>(args)...);
}

template <typename... Args>
void warn(const char* fmt, Args&&... args) {
  detail::log(level::warn, fmt, std::forward<Args>(args)...);
}

template <typename... Args>
void error(const char* fmt, Args&&... args) {
  detail::log(level::err, fmt, std::forward<Args>(args)...);
}

template <typename... Args>
void critical(const char* fmt, Args&&... args) {
  detail::log(level::critical, fmt, std::forward<Args>(args)...);
}

}  // namespace spdlog
