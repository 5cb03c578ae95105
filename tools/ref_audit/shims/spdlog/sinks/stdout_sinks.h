// Shim: the reference's logging.cc includes this for stderr_logger_mt,
// which our spdlog.h shim already provides.
#pragma once

#include "../spdlog.h"
