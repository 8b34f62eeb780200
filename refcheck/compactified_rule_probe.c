/* PROVENANCE: new thin harness calling the reference's own compactified
 * quadrature rule constructors
 * (/root/reference/src/Quadrature/d4est_quadrature_compactified.c
 * c1tpc2_negk_{aa_and_bb,moment_fcn,weight_fcn} through
 * Utilities/arbquad.c) — ground-truth oracle for disco4est_tpu's
 * numerically-computed Stieltjes rules
 * (disco4est_tpu/quadrature/compactified.py).  Part of the refcheck
 * oracle, NOT of disco4est_tpu; never imported by the framework.
 *
 * Usage: compactified_rule_probe <c1> <c2> <k> <n>
 * Prints n lines "abscissa weight" at %.18Le after the reference's
 * divide-by-weight-fcn postprocessing (the drop-in-for-Gauss form).
 */
#include <stdio.h>
#include <stdlib.h>
#include <pXest.h>
#include <arbquad.h>
#include <d4est_quadrature.h>
#include <d4est_geometry.h>
#include <d4est_quadrature_compactified.h>

typedef struct {
  long double c1;
  long double c2;
} params_t;

int main(int argc, char **argv)
{
  if (argc != 5) {
    printf("usage: %s c1 c2 k n\n", argv[0]);
    return 1;
  }
  params_t params;
  params.c1 = strtold(argv[1], NULL);
  params.c2 = strtold(argv[2], NULL);
  int k = atoi(argv[3]);
  int n = atoi(argv[4]);

  long double *weights = malloc(sizeof(long double) * n);
  long double *abscissas = malloc(sizeof(long double) * n);

  arbquad_moment_fcn_t mf;
  arbquad_aa_and_bb_fcn_t ab;
  arbquad_weight_fcn_t wf;
  if (k == 1) {
    mf = d4est_quadrature_compactified_c1tpc2_neg1_moment_fcn;
    ab = d4est_quadrature_compactified_c1tpc2_neg1_aa_and_bb;
    wf = d4est_quadrature_compactified_c1tpc2_neg1_weight_fcn;
  } else if (k == 2) {
    mf = d4est_quadrature_compactified_c1tpc2_neg2_moment_fcn;
    ab = d4est_quadrature_compactified_c1tpc2_neg2_aa_and_bb;
    wf = d4est_quadrature_compactified_c1tpc2_neg2_weight_fcn;
  } else if (k == 3) {
    mf = d4est_quadrature_compactified_c1tpc2_neg3_moment_fcn;
    ab = d4est_quadrature_compactified_c1tpc2_neg3_aa_and_bb;
    wf = d4est_quadrature_compactified_c1tpc2_neg3_weight_fcn;
  } else if (k == 4) {
    mf = d4est_quadrature_compactified_c1tpc2_neg4_moment_fcn;
    ab = d4est_quadrature_compactified_c1tpc2_neg4_aa_and_bb;
    wf = d4est_quadrature_compactified_c1tpc2_neg4_weight_fcn;
  } else {
    printf("k must be 1..4\n");
    return 1;
  }

  arbquad_get_abscissas_and_weights_use_aa_and_bb(
      n, weights, abscissas, mf, ab, &params,
      DIVIDE_WEIGHTS_BY_WEIGHT_FCN, wf);

  for (int i = 0; i < n; i++)
    printf("%.18Le %.18Le\n", abscissas[i], weights[i]);
  return 0;
}
