#!/bin/bash
# Build libd8est_core.a (DIM=3) + harness executables into ../refbuild/harness.
set -u
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/src
B=$HERE/../refbuild
INST=$B/install
OUT=$B/harness
DEFS="-DDIM=3"
OBJDIR=obj3
LIBNAME=libd8est_core.a
if [ "${TESTMODE:-0}" = "1" ]; then
  DEFS="-DDIM=3 -DD4EST_TEST"
  OBJDIR=obj3t
  LIBNAME=libd8est_core_t.a
fi
mkdir -p $OUT/$OBJDIR $OUT/run
STUBS=$HERE/stubs
INC="-I$STUBS -I$REF/pXest -I$REF/Utilities -I$REF/LinearAlgebra -I$REF/Kron -I$REF/dGMath -I$REF/Quadrature -I$REF/Geometry -I$REF/Mesh -I$REF/EllipticSystem -I$REF/Estimators -I$REF/hpAMR -I$REF/Solver -I$REF/IO -I$REF/Databox -I$REF/Dictionary -I$REF/Problems -I$INST/include"
SRCS=$(cat $HERE/core_sources.txt)
fails=0
OBJS="$OUT/$OBJDIR/stub_impls.o $OUT/$OBJDIR/petsc_solver_stubs.o"
gcc -c -O2 -g $STUBS/stub_impls.c -o $OUT/$OBJDIR/stub_impls.o -I$STUBS
gcc -c -O2 -g $DEFS $INC $STUBS/petsc_solver_stubs.c -o $OUT/$OBJDIR/petsc_solver_stubs.o -Wno-implicit-function-declaration
for f in $SRCS; do
  b=$(basename $f .c)
  o=$OUT/$OBJDIR/$b.o
  if [ ! -f $o ] || [ $REF/$f -nt $o ]; then
    gcc -c -O2 -g $DEFS $INC -Wno-implicit-function-declaration $REF/$f -o $o 2> $OUT/$OBJDIR/$b.err
    if [ $? -ne 0 ]; then echo "FAIL: $b"; fails=$((fails+1)); continue
    else rm -f $OUT/$OBJDIR/$b.err; fi
  fi
  OBJS="$OBJS $o"
done
ar rcs $OUT/$LIBNAME $OBJS
echo "core: fails=$fails objs=$(echo $OBJS | wc -w)"
LIBS="$OUT/$LIBNAME -L$INST/lib -lp4est -lsc -lzlog -l:liblapack.so.3 -l:libblas.so.3 -lz -lm -lpthread"

# The reference's d4est_quadrature_compactified.c is bit-rotted against
# the current geometry/mortar APIs (not even in the reference CMake
# build).  For the compactified-rule ORACLE we machine-extract just the
# self-contained c1tpc2 rule functions (lines 1031-1674: aa_and_bb,
# moment, weight fns) into a generated TU under refbuild (gitignored).
gen_compactified() {
  GEN=$OUT/gen_compactified_fns.c
  {
    echo '/* MACHINE-GENERATED from /root/reference/src/Quadrature/'
    echo '   d4est_quadrature_compactified.c lines 1031-1674 by build.sh'
    echo '   (refcheck oracle only; see compactified_rule_probe.c) */'
    echo '#include <math.h>'
    echo '#include <stdio.h>'
    echo '#include <stdlib.h>'
    echo '#define D4EST_ABORT(s) do { printf("%s\n", s); abort(); } while (0)'
    echo 'typedef struct { long double c1; long double c2; } d4est_quadrature_compactified_params_t;'
    sed -n '1031,1674p' /root/reference/src/Quadrature/d4est_quadrature_compactified.c
  } > $GEN
  gcc -c -O2 -g $GEN -o $OUT/$OBJDIR/gen_compactified_fns.o
}
for h in "$@"; do
  name=$(basename $h .c)
  extra_inc=""
  extra_obj=""
  case $name in
    poisson_sinx*|*lorentzian*) extra_inc="-I$REF/Problems/Poisson";;
    stamm*) extra_inc="-I$REF/Problems/Stamm";;
    *cds*|*constant*) extra_inc="-I$REF/Problems/ConstantDensityStar";;
    *punctur*) extra_inc="-I$REF/Problems/TwoPunctures";;
    *schwarz*) extra_inc="-I$REF/Tests/Unit";;
    compactified_rule*) gen_compactified; extra_obj="$OUT/$OBJDIR/gen_compactified_fns.o";;
  esac
  gcc -O2 -g $DEFS $INC $extra_inc -Wno-implicit-function-declaration $HERE/$h $extra_obj $LIBS -o $OUT/$name && echo "built $name"
done
cp -n /root/reference/src/IO/logging.conf $OUT/run/ 2>/dev/null || true
