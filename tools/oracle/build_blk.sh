#!/bin/bash
# Build the DEBUG_BLOCK_INFO-instrumented oracle at /tmp/dav1d_blk.
#
# Creates /tmp/dbgsrc (a patched copy of reference decode.c + recon.h),
# applies the trace instrumentation (block-info prints enabled, refmvs
# candidate dump, zeroed mvstack for deterministic prints, sbrow-end
# diagnostics), compiles against the prebuilt oracle objects and links.
# tools/trace_diff.py consumes the binary. Requires a prior
# tools/oracle/build_oracle.sh run (for oracle-build/obj + CLI objects).
set -euo pipefail
REF=/root/reference
OUT=/root/repo/oracle-build
DBG=/tmp/dbgsrc

mkdir -p "$DBG/src"
cp "$REF/src/decode.c" "$DBG/src/decode.c"
cp "$REF/src/recon.h" "$DBG/src/recon.h"

# enable the block-info trace
sed -i 's/#define DEBUG_BLOCK_INFO 0 &&/#define DEBUG_BLOCK_INFO 1 ||/' "$DBG/src/recon.h"

python3 - "$DBG/src/decode.c" <<'EOF'
import re, sys
p = sys.argv[1]
src = open(p).read()
# deterministic refmvs prints: zero the stack (single-ref paths leave
# mv[1] uninitialized) and dump (n, ctx, candidates) after each find
src = src.replace("refmvs_candidate mvstack[8];",
                  "refmvs_candidate mvstack[8]; memset(mvstack, 0, sizeof(mvstack));")
pat = re.compile(r"(dav1d_refmvs_find\(&t->rt, mvstack, &n_mvs, &ctx,.*?t->by, t->bx\);)", re.S)
def repl(m):
    return m.group(1) + '''
            if (DEBUG_BLOCK_INFO) { /* REFMVS-DBG */
                printf("Refmvs[n=%d,ctx=%d", n_mvs, ctx);
                for (int _i = 0; _i < n_mvs && _i < 4; _i++)
                    printf(",(%d,%d|%d,%d)", mvstack[_i].mv.mv[0].y, mvstack[_i].mv.mv[0].x,
                           mvstack[_i].mv.mv[1].y, mvstack[_i].mv.mv[1].x);
                printf("]: r=%d\\n", ts->msac.rng);
            }'''
src, n = pat.subn(repl, src)
assert n == 4, n
# diagnose strict-mode overread at sbrow end
src = src.replace(
    "    if (ts->msac.cnt <= -15) return 1;",
    '    fprintf(stderr, "sbrow end: msac.cnt=%d rng=%u by=%d\\n",'
    ' ts->msac.cnt, ts->msac.rng, t->by);\n'
    "    if (ts->msac.cnt <= -15) return 1;")
open(p, "w").write(src)
EOF

CFLAGS="-O1 -g0 -std=c11 -D_GNU_SOURCE -DNDEBUG -fvisibility=hidden \
  -I$DBG -I$OUT/include -I$REF/include -I$REF/include/dav1d -I$REF/src -I$REF"
gcc $CFLAGS -c "$DBG/src/decode.c" -o "$DBG/decode.o"
gcc $CFLAGS -DBITDEPTH=8  -c "$REF/src/recon_tmpl.c" -o "$DBG/recon_8.o"
gcc $CFLAGS -DBITDEPTH=16 -c "$REF/src/recon_tmpl.c" -o "$DBG/recon_16.o"
objs=$(ls "$OUT"/obj/*.o | grep -v -e '/decode\.o' -e '/recon_8\.o' -e '/recon_16\.o' -e 'tool_')
gcc "$OUT"/obj/tool_*.o "$DBG/decode.o" "$DBG/recon_8.o" "$DBG/recon_16.o" $objs \
    -lpthread -lm -ldl -o /tmp/dav1d_blk
echo "rebuilt /tmp/dav1d_blk"
