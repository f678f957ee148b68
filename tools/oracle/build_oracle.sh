#!/bin/bash
# Build the reference dav1d decoder (C-only, no asm) as a test oracle.
# The oracle binary is used by tests/ to produce golden YUV/md5 output that
# our TPU-native decoder must match bit-exactly (SURVEY.md §4 tier 2).
#
# We hand-roll the build (no meson in this image): plain C files compiled once,
# *_tmpl.c files compiled twice with -DBITDEPTH=8/16 (reference
# src/meson.build:30-76 file lists).
set -euo pipefail

REF=/root/reference
OUT=${1:-/root/repo/oracle-build}
mkdir -p "$OUT/obj" "$OUT/include/dav1d"

# --- generated headers -------------------------------------------------------
cat > "$OUT/include/config.h" <<'EOF'
#pragma once
#define ARCH_AARCH64 0
#define ARCH_ARM 0
#define ARCH_PPC64LE 0
#define ARCH_RISCV 0
#define ARCH_RV32 0
#define ARCH_RV64 0
#define ARCH_LOONGARCH 0
#define ARCH_LOONGARCH32 0
#define ARCH_LOONGARCH64 0
#define ARCH_X86 1
#define ARCH_X86_64 1
#define ARCH_X86_32 0
#define CONFIG_16BPC 1
#define CONFIG_8BPC 1
#define CONFIG_LOG 1
#define ENDIANNESS_BIG 0
#define HAVE_ASM 0
#define HAVE_C11_GENERIC 1
#define HAVE_CLOCK_GETTIME 1
#define HAVE_DLSYM 1
#define HAVE_POSIX_MEMALIGN 1
#define HAVE_PTHREAD_GETAFFINITY_NP 1
#define HAVE_PTHREAD_SETAFFINITY_NP 1
#define HAVE_PTHREAD_SETNAME_NP 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_UNISTD_H 1
#define HAVE_GETAUXVAL 0
#define HAVE_ELF_AUX_INFO 0
#define HAVE_IO_H 0
#define HAVE_MEMALIGN 0
#define HAVE_ALIGNED_ALLOC 1
#define HAVE_PTHREAD_NP_H 0
#define HAVE_PTHREAD_SET_NAME_NP 0
#define HAVE_SIGACTION 1
#define TRIM_DSP_FUNCTIONS 0
EOF
cat > "$OUT/include/cli_config.h" <<'EOF'
#pragma once
#define HAVE_CLOCK_GETTIME 1
#define HAVE_SIGACTION 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_UNISTD_H 1
#define HAVE_IO_H 0
#define HAVE_XXHASH_H 0
EOF
cat > "$OUT/include/vcs_version.h" <<'EOF'
#define DAV1D_VERSION "1.5.4-oracle"
EOF
cp "$REF/include/dav1d/version.h" "$OUT/include/dav1d/version.h" 2>/dev/null || true

CFLAGS="-O2 -g0 -std=c11 -D_GNU_SOURCE -DNDEBUG -fvisibility=hidden \
  -I$OUT/include -I$REF/include -I$REF/include/dav1d -I$REF/src -I$REF"
# dav1d C sources include via "common/..." and "src/..." relative to repo root,
# plus "config.h" and "vcs_version.h" generated.

cc() { gcc $CFLAGS "$@"; }

SRC="cdf cpu ctx data decode dequant_tables getbits intra_edge itx_1d lf_mask \
     lib log mem msac obu pal picture qm ref refmvs scan tables thread_task \
     warpmv wedge"
TMPL="cdef_apply cdef fg_apply filmgrain ipred_prepare ipred itx lf_apply \
      loopfilter looprestoration lr_apply mc recon"

pids=()
for f in $SRC; do
  cc -c "$REF/src/$f.c" -o "$OUT/obj/$f.o" &
  pids+=($!)
done
for f in $TMPL; do
  cc -DBITDEPTH=8  -c "$REF/src/${f}_tmpl.c" -o "$OUT/obj/${f}_8.o" &
  pids+=($!)
  cc -DBITDEPTH=16 -c "$REF/src/${f}_tmpl.c" -o "$OUT/obj/${f}_16.o" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done

ar rcs "$OUT/libdav1d.a" "$OUT"/obj/*.o

# --- CLI tool ----------------------------------------------------------------
TOOLS="dav1d dav1d_cli_parse"
INPUT="input/input input/annexb input/ivf input/section5"
OUTPUTS="output/md5 output/null output/output output/y4m2 output/yuv"
tpids=()
for f in $TOOLS $INPUT $OUTPUTS; do
  o=$(basename "$f")
  gcc $CFLAGS -I"$REF/tools" -c "$REF/tools/$f.c" -o "$OUT/obj/tool_$o.o" &
  tpids+=($!)
done
for p in "${tpids[@]}"; do wait "$p"; done

gcc "$OUT"/obj/tool_*.o "$OUT/libdav1d.a" -lpthread -lm -ldl -o "$OUT/dav1d"
echo "oracle built: $OUT/dav1d"
"$OUT/dav1d" --version
