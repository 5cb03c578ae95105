// Minimal cpu_features shim (the vendored third_party/cpu_features
// submodule is not populated).  Provides the struct fields and the one
// function used by /root/reference/src/cpu/cpu_info.cc, implemented with
// GCC's __builtin_cpu_supports.
#pragma once

#include <cstring>

#define CPU_FEATURES_VENDOR_GENUINE_INTEL "GenuineIntel"

namespace cpu_features {

struct X86Features {
  bool sse4_1;
  bool avx;
  bool avx2;
  bool avx512f;
  bool avx512cd;
  bool avx512vl;
  bool avx512dq;
  bool avx512bw;
};

struct X86Info {
  char vendor[16];
  X86Features features;
};

inline X86Info GetX86Info() {
  X86Info info;
  std::memset(&info, 0, sizeof(info));
  unsigned int eax = 0, ebx = 0, ecx = 0, edx = 0;
  __asm__ volatile("cpuid"
                   : "=a"(eax), "=b"(ebx), "=c"(ecx), "=d"(edx)
                   : "a"(0), "c"(0));
  std::memcpy(info.vendor + 0, &ebx, 4);
  std::memcpy(info.vendor + 4, &edx, 4);
  std::memcpy(info.vendor + 8, &ecx, 4);
  info.vendor[12] = '\0';
  __builtin_cpu_init();
  info.features.sse4_1 = __builtin_cpu_supports("sse4.1");
  info.features.avx = __builtin_cpu_supports("avx");
  info.features.avx2 = __builtin_cpu_supports("avx2");
  info.features.avx512f = __builtin_cpu_supports("avx512f");
  info.features.avx512cd = __builtin_cpu_supports("avx512cd");
  info.features.avx512vl = __builtin_cpu_supports("avx512vl");
  info.features.avx512dq = __builtin_cpu_supports("avx512dq");
  info.features.avx512bw = __builtin_cpu_supports("avx512bw");
  return info;
}

}  // namespace cpu_features
