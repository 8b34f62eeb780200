/* PETSc-solver stand-ins: forward SNES/KSP entry points to the
 * reference's own in-house Newton (Solver/d4est_solver_newton.c) and
 * FCG (Solver/d4est_solver_fcg_improved.c).  Converged solutions are
 * solver-independent, so regression digits obtained this way match the
 * PETSc drivers whenever both solve to tight tolerance. */
#include <pXest.h>
#include <d4est_elliptic_data.h>
#include <d4est_elliptic_eqns.h>
#include <d4est_krylov_pc.h>
#include <d4est_solver_newton.h>
#include <d4est_solver_fcg_improved.h>
#include <d4est_solver_newton_petsc.h>
#include <d4est_solver_krylov_petsc.h>
#include <string.h>
#include <math.h>
#include <stdlib.h>
#include <stdio.h>

const char *g_refcheck_input_file = "options.input";

void d4est_solver_newton_petsc_input(p4est_t *p4est, const char *input_file,
                                     d4est_solver_newton_petsc_params_t *in) {
  (void)p4est;
  memset(in, 0, sizeof(*in));
  g_refcheck_input_file = input_file;
}

void d4est_solver_krylov_petsc_input(p4est_t *p4est, const char *input_file,
                                     const char *input_section,
                                     d4est_solver_krylov_petsc_params_t *in) {
  (void)p4est;
  (void)input_section;
  memset(in, 0, sizeof(*in));
  g_refcheck_input_file = input_file;
}

d4est_solver_newton_petsc_info_t d4est_solver_newton_petsc_solve(
    p4est_t *p4est, d4est_elliptic_data_t *vecs, d4est_elliptic_eqns_t *fcns,
    d4est_ghost_t **ghost, d4est_ghost_data_t **ghost_data,
    d4est_operators_t *d4est_ops, d4est_geometry_t *d4est_geom,
    d4est_quadrature_t *d4est_quad, d4est_mesh_data_t *d4est_factors,
    d4est_solver_krylov_petsc_params_t *krylov_options,
    d4est_solver_newton_petsc_params_t *newton_options,
    d4est_krylov_pc_t *d4est_krylov_pc, int amr_level) {
  /* Dense-direct damped Newton (ground-truth mode): robust to the
   * indefinite early Jacobians that break unpreconditioned FCG/CG on
   * TwoPunctures.  The converged solution of the discrete nonlinear
   * system is unique, so digits match any solver that converges. */
  (void)krylov_options; (void)newton_options; (void)d4est_krylov_pc;
  (void)amr_level;
  extern void dgesv_(int *n, int *nrhs, double *a, int *lda, int *ipiv,
                     double *b, int *ldb, int *info);
  int n = vecs->local_nodes;
  double *x = vecs->u;
  double *F = malloc(n * sizeof(double));
  double *Ft = malloc(n * sizeof(double));
  double *xt = malloc(n * sizeof(double));
  double *col = malloc(n * sizeof(double));
  double *e = malloc(n * sizeof(double));
  double *J = malloc((size_t)n * n * sizeof(double));
  int *ipiv = malloc(n * sizeof(int));
  d4est_elliptic_data_t v;
  for (int it = 0; it < 200; it++) {
    v = *vecs; v.u = x; v.Au = F; v.rhs = vecs->rhs;
    d4est_elliptic_eqns_build_residual(p4est, *ghost, *ghost_data, fcns, &v,
                                       d4est_ops, d4est_geom, d4est_quad,
                                       d4est_factors);
    double fn = 0;
    for (int i = 0; i < n; i++) fn += F[i] * F[i];
    fn = sqrt(fn);
    printf("DENSE_NEWTON: it %d fnrm %.16e\n", it, fn);
    if (fn < 1e-14) break;
    for (int j = 0; j < n; j++) {
      for (int i = 0; i < n; i++) e[i] = 0.0;
      e[j] = 1.0;
      v = *vecs; v.u0 = x; v.u = e; v.Au = col;
      d4est_elliptic_eqns_apply_lhs(p4est, *ghost, *ghost_data, fcns, &v,
                                    d4est_ops, d4est_geom, d4est_quad,
                                    d4est_factors);
      for (int i = 0; i < n; i++) J[(size_t)j * n + i] = col[i];
    }
    double *step = col;
    for (int i = 0; i < n; i++) step[i] = -F[i];
    int nrhs = 1, info = 0;
    dgesv_(&n, &nrhs, J, &n, ipiv, step, &n, &info);
    if (info != 0) { printf("DENSE_NEWTON: dgesv info %d\n", info); break; }
    double lambda = 1.0;
    int accepted = 0;
    for (int bt = 0; bt < 40; bt++) {
      for (int i = 0; i < n; i++) xt[i] = x[i] + lambda * step[i];
      v = *vecs; v.u = xt; v.Au = Ft;
      d4est_elliptic_eqns_build_residual(p4est, *ghost, *ghost_data, fcns,
                                         &v, d4est_ops, d4est_geom,
                                         d4est_quad, d4est_factors);
      double ftn = 0;
      for (int i = 0; i < n; i++) ftn += Ft[i] * Ft[i];
      ftn = sqrt(ftn);
      if (ftn == ftn && ftn < fn) { accepted = 1; break; }
      lambda *= 0.5;
    }
    if (!accepted) { printf("DENSE_NEWTON: line search failed\n"); break; }
    for (int i = 0; i < n; i++) x[i] = xt[i];
  }
  free(F); free(Ft); free(xt); free(col); free(e); free(J); free(ipiv);
  d4est_solver_newton_petsc_info_t info2;
  memset(&info2, 0, sizeof(info2));
  return info2;
}

d4est_solver_krylov_petsc_info_t d4est_solver_krylov_petsc_solve(
    p4est_t *p4est, d4est_elliptic_data_t *vecs, d4est_elliptic_eqns_t *fcns,
    d4est_ghost_t **ghost, d4est_ghost_data_t **ghost_data,
    d4est_operators_t *d4est_ops, d4est_geometry_t *d4est_geom,
    d4est_quadrature_t *d4est_quad, d4est_mesh_data_t *d4est_factors,
    d4est_solver_krylov_petsc_params_t *params,
    d4est_krylov_pc_t *d4est_krylov_pc, int amr_level) {
  (void)params;
  d4est_solver_fcg_params_t fcg_params;
  d4est_solver_fcg_input(p4est, g_refcheck_input_file, "d4est_solver_fcg",
                         &fcg_params);
  d4est_solver_fcg_solve(p4est, vecs, fcns, ghost, ghost_data, d4est_ops,
                         d4est_geom, d4est_quad, d4est_factors, &fcg_params,
                         d4est_krylov_pc, amr_level, 0);
  d4est_solver_krylov_petsc_info_t info;
  memset(&info, 0, sizeof(info));
  return info;
}

/* VTK output is irrelevant to the digit; the real writer drags in
 * p4est_vtk_ext.  Keep signature ABI-compatible (all pointers + int). */
void d4est_vtk_save(p4est_t *p4est, d4est_operators_t *d4est_ops,
                    const char *input_file, const char *input_section,
                    const char **dg_field_names, double **dg_fields,
                    const char **element_field_names, double **element_fields,
                    const char **int_names, int **int_fields, int level) {
  (void)p4est; (void)d4est_ops; (void)input_file; (void)input_section;
  (void)dg_field_names; (void)dg_fields; (void)element_field_names;
  (void)element_fields; (void)int_names; (void)int_fields; (void)level;
}

/* Schwarz KSP subdomain solver (PETSc) — never selected by harness
 * configs; abort loudly if reached. */
#include <d4est_solver_schwarz_subdomain_solver_ksp.h>
#include <stdlib.h>

d4est_solver_schwarz_subdomain_solver_info_t
d4est_solver_schwarz_subdomain_solver_ksp(
    p4est_t *p4est, d4est_geometry_t *d4est_geom,
    d4est_quadrature_t *d4est_quad, d4est_mesh_data_t *d4est_factors,
    d4est_ghost_t *ghost, d4est_solver_schwarz_operators_t *schwarz_ops,
    d4est_solver_schwarz_metadata_t *schwarz_metadata,
    d4est_solver_schwarz_geometric_data_t *schwarz_geometric_data,
    d4est_solver_schwarz_apply_lhs_t *apply_lhs,
    double *du_restricted_field_over_subdomain,
    double *rhs_restricted_field_over_subdomain, int subdomain,
    void *params) {
  fprintf(stderr, "schwarz ksp subdomain solver stub reached\n");
  abort();
}

d4est_solver_schwarz_subdomain_solver_ksp_data_t *
d4est_solver_schwarz_subdomain_solver_ksp_init(p4est_t *p4est,
                                               const char *input_file,
                                               const char *input_section) {
  fprintf(stderr, "schwarz ksp subdomain solver stub reached\n");
  abort();
}

void d4est_solver_schwarz_subdomain_solver_ksp_destroy(void *params) {
  (void)params;
}

/* VTK helper-array fields (debug visualization inside Schwarz helpers);
 * only called when a helper array is non-NULL — return a scratch buffer
 * large enough for any nodal field in these small harness meshes. */
#include <d4est_vtk.h>
double *d4est_vtk_helper_array_alloc_and_add_nodal_dbl_field(
    d4est_vtk_helper_array_t *array, const char *prefix, int suffix_id) {
  (void)array; (void)prefix; (void)suffix_id;
  static double scratch[1 << 22];
  return scratch;
}

void d4est_vtk_save_aux(p4est_t *p4est, d4est_operators_t *d4est_ops,
                        const char *input_file, const char *input_section,
                        const char **dg_field_names, double **dg_fields,
                        const char **element_float_field_names,
                        double **element_float_fields,
                        const char **element_int_field_names,
                        int **element_int_fields, const char *folder,
                        int sub_folder_number) {
  (void)p4est; (void)d4est_ops; (void)input_file; (void)input_section;
  (void)dg_field_names; (void)dg_fields; (void)element_float_field_names;
  (void)element_float_fields; (void)element_int_field_names;
  (void)element_int_fields; (void)folder; (void)sub_folder_number;
}

/* MG smoother/bottom KSP plugins (PETSc) — not selected by harness
 * configs (they use cheby/cg); abort if reached. */
#include <d4est_solver_multigrid.h>
#include <d4est_solver_multigrid_bottom_solver_krylov_petsc.h>
#include <d4est_solver_multigrid_smoother_krylov_petsc.h>

d4est_solver_multigrid_bottom_solver_t *
d4est_solver_multigrid_bottom_solver_krylov_petsc_init(
    p4est_t *p4est, const char *input_file) {
  (void)p4est; (void)input_file;
  fprintf(stderr, "mg bottom krylov_petsc stub reached\n");
  abort();
}
void d4est_solver_multigrid_bottom_solver_krylov_petsc_destroy(
    d4est_solver_multigrid_bottom_solver_t *solver) {
  (void)solver;
}
d4est_solver_multigrid_smoother_t *
d4est_solver_multigrid_smoother_krylov_petsc_init(p4est_t *p4est,
                                                  const char *input_file) {
  (void)p4est; (void)input_file;
  fprintf(stderr, "mg smoother krylov_petsc stub reached\n");
  abort();
}
void d4est_solver_multigrid_smoother_krylov_petsc_destroy(
    d4est_solver_multigrid_smoother_t *solver) {
  (void)solver;
}

/* extended p4est vtk writer (corner output) — not digit-relevant */
void p4est_vtk_ext_write_all(p4est_t *p4est, void *geom, double scale,
                             int write_tree, int write_level,
                             int write_rank, int wrap_rank,
                             int num_scalars, int num_vectors,
                             const char *filename, ...) {
  (void)p4est; (void)geom; (void)scale; (void)write_tree;
  (void)write_level; (void)write_rank; (void)wrap_rank;
  (void)num_scalars; (void)num_vectors; (void)filename;
}
