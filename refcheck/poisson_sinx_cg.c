/* PROVENANCE: new thin harness re-expressing the setup of the reference's
 * /root/reference/src/driver.c + src/Problems/Poisson/poisson_sinx_uniform.c
 * against the reference's own core objects (refcheck oracle; NOT part of
 * disco4est_tpu and never imported by it).
 *
 * Ground-truth harness: reference d4est Poisson-sinx with in-house CG.
 *
 * Reproduces driver.c + Problems/Poisson/poisson_sinx_uniform.c using only
 * the PETSc/HDF5-free core (single rank; digits are rank-independent by
 * the reference's MPI-invariance contract).  Prints the regression line
 * "num_quadrants num_nodes num_quad_nodes L2 Linfty" with full digits.
 */
#include <pXest.h>
#include <stdio.h>
#include <d4est_geometry.h>
#include <d4est_mesh.h>
#include <d4est_element_data.h>
#include <d4est_ghost.h>
#include <d4est_ghost_data.h>
#include <d4est_quadrature.h>
#include <d4est_operators.h>
#include <d4est_amr.h>
#include <d4est_laplacian.h>
#include <d4est_laplacian_flux.h>
#include <d4est_linalg.h>
#include <d4est_solver_cg.h>
#include <d4est_norms.h>
#include <d4est_util.h>
#include <zlog.h>
#include <poisson_sinx_fcns.h>

int main(int argc, char *argv[]) {
  sc_MPI_Comm mpicomm = sc_MPI_COMM_WORLD;
  if (zlog_init("logging.conf") != 0) {
    printf("zlog init failed\n");
    return 1;
  }
  p4est_init(NULL, SC_LP_ERROR);
  const char *input_file = (argc == 2) ? argv[1] : "options.input";

  zlog_category_t *c_geom = zlog_get_category("d4est_geometry");
  d4est_geometry_t *d4est_geom =
      d4est_geometry_new(0, (char *)input_file, "geometry", c_geom);
  d4est_mesh_initial_extents_t *init_ext =
      d4est_mesh_initial_extents_parse((char *)input_file, d4est_geom);
  d4est_operators_t *d4est_ops = d4est_ops_init(init_ext->max_degree);

  p4est_t *p4est = p4est_new_ext(
      mpicomm, d4est_geom->p4est_conn, init_ext->min_quadrants,
      init_ext->min_level, init_ext->fill_uniform,
      sizeof(d4est_element_data_t), NULL, NULL);
  p4est_partition(p4est, init_ext->keep_quad_fams_together ? 1 : 0, NULL);
  p4est_balance(p4est, P4EST_CONNECT_FULL, NULL);

  d4est_ghost_t *d4est_ghost = NULL;
  d4est_mesh_data_t *d4est_factors = d4est_mesh_data_init(p4est);
  d4est_quadrature_t *d4est_quad = d4est_quadrature_new(
      p4est, d4est_ops, d4est_geom, (char *)input_file, "quadrature");
  d4est_mesh_local_sizes_t local_sizes = d4est_mesh_update(
      p4est, &d4est_ghost, d4est_ops, d4est_geom, d4est_quad, d4est_factors,
      init_ext, INITIALIZE_GHOST, INITIALIZE_QUADRATURE_DATA,
      INITIALIZE_GEOMETRY_DATA, INITIALIZE_GEOMETRY_ALIASES,
      d4est_mesh_set_initial_extents, (void *)init_ext);
  init_ext->initial_nodes = local_sizes.local_nodes;

  dirichlet_bndry_eval_method_t eval_method = EVAL_BNDRY_FCN_ON_LOBATTO;
  d4est_laplacian_dirichlet_bc_t bc_lhs = {.dirichlet_fcn = zero_fcn,
                                           .eval_method = eval_method};
  d4est_laplacian_dirichlet_bc_t bc_rhs = {
      .dirichlet_fcn = poisson_sinx_boundary_fcn, .eval_method = eval_method};
  d4est_laplacian_flux_data_t *flux_lhs = d4est_laplacian_flux_new(
      p4est, (char *)input_file, BC_DIRICHLET, &bc_lhs);
  d4est_laplacian_flux_data_t *flux_rhs = d4est_laplacian_flux_new(
      p4est, (char *)input_file, BC_DIRICHLET, &bc_rhs);

  problem_ctx_t ctx = {.flux_data_for_apply_lhs = flux_lhs,
                       .flux_data_for_build_rhs = flux_rhs};
  d4est_elliptic_eqns_t prob_fcns = {.build_residual =
                                         poisson_sinx_build_residual,
                                     .apply_lhs = poisson_sinx_apply_lhs,
                                     .user = &ctx};

  d4est_elliptic_data_t prob_vecs;
  prob_vecs.Au = P4EST_ALLOC(double, init_ext->initial_nodes);
  prob_vecs.u = P4EST_ALLOC(double, init_ext->initial_nodes);
  prob_vecs.rhs = P4EST_ALLOC(double, init_ext->initial_nodes);
  prob_vecs.local_nodes = init_ext->initial_nodes;

  d4est_amr_t *d4est_amr = d4est_amr_init(p4est, (char *)input_file, NULL);
  d4est_mesh_init_field(p4est, prob_vecs.u, poisson_sinx_initial_guess,
                        d4est_ops, d4est_geom, d4est_factors,
                        INIT_FIELD_ON_LOBATTO, NULL);
  d4est_field_type_t field_type = NODAL;

  d4est_norms_fcn_L2_ctx_t L2_ctx = {.p4est = p4est,
                                     .d4est_ops = d4est_ops,
                                     .d4est_geom = d4est_geom,
                                     .d4est_quad = d4est_quad,
                                     .d4est_factors = d4est_factors};

  for (int level = 0; level < d4est_amr->num_of_amr_steps + 1; level++) {
    d4est_ghost_data_t *d4est_ghost_data =
        d4est_ghost_data_init(p4est, d4est_ghost, &field_type, 1);

    d4est_laplacian_build_rhs_with_strong_bc(
        p4est, d4est_ghost, d4est_ghost_data, d4est_ops, d4est_geom,
        d4est_quad, d4est_factors, &prob_vecs, flux_rhs, prob_vecs.rhs,
        poisson_sinx_rhs_fcn, INIT_FIELD_ON_LOBATTO, &ctx, 0);


    /* --- diagnostic probes (ordering-independent scalars) -------------- */
    {
      double *probe = P4EST_ALLOC(double, prob_vecs.local_nodes);
      d4est_mesh_init_field(p4est, probe, poisson_sinx_analytic_solution,
                            d4est_ops, d4est_geom, d4est_factors,
                            INIT_FIELD_ON_LOBATTO, NULL);
      double rhs2 = 0.0, rdotp = 0.0;
      for (int i = 0; i < prob_vecs.local_nodes; i++) {
        rhs2 += prob_vecs.rhs[i] * prob_vecs.rhs[i];
        rdotp += prob_vecs.rhs[i] * probe[i];
      }
      double *save_u = prob_vecs.u;
      double *Au_save = prob_vecs.Au;
      prob_vecs.u = probe;
      prob_vecs.Au = P4EST_ALLOC(double, prob_vecs.local_nodes);
      d4est_elliptic_eqns_apply_lhs(p4est, d4est_ghost, d4est_ghost_data,
                                    &prob_fcns, &prob_vecs, d4est_ops,
                                    d4est_geom, d4est_quad, d4est_factors);
      double Au2 = 0.0, uAu = 0.0;
      for (int i = 0; i < prob_vecs.local_nodes; i++) {
        Au2 += prob_vecs.Au[i] * prob_vecs.Au[i];
        uAu += probe[i] * prob_vecs.Au[i];
      }
      printf("PROBE: rhs2 %.16e rdotp %.16e Au2 %.16e uAu %.16e\n",
             rhs2, rdotp, Au2, uAu);
      P4EST_FREE(prob_vecs.Au);
      prob_vecs.u = save_u;
      prob_vecs.Au = Au_save;
    }
    d4est_solver_cg_params_t cg_params;
    d4est_solver_cg_input(p4est, (char *)input_file, "d4est_solver_cg",
                          "[D4EST_SOLVER_CG]", &cg_params);
    d4est_solver_cg_solve(p4est, &prob_vecs, &prob_fcns, &d4est_ghost,
                          &d4est_ghost_data, d4est_ops, d4est_geom,
                          d4est_quad, d4est_factors, &cg_params, NULL);

    double *u_analytic = P4EST_ALLOC(double, prob_vecs.local_nodes);
    d4est_mesh_init_field(p4est, u_analytic, poisson_sinx_analytic_solution,
                          d4est_ops, d4est_geom, d4est_factors,
                          INIT_FIELD_ON_LOBATTO, NULL);
    double *error = P4EST_ALLOC(double, prob_vecs.local_nodes);
    d4est_linalg_vec_fabsdiff(prob_vecs.u, u_analytic, error,
                              prob_vecs.local_nodes);
    double u2s=0.0, e2s=0.0, el2=0.0;
    for (int i = 0; i < prob_vecs.local_nodes; i++) {
      u2s += prob_vecs.u[i]*prob_vecs.u[i];
      e2s += error[i]*error[i];
    }
    el2 = d4est_mesh_compute_l2_norm_sqr(p4est, d4est_ops, d4est_geom,
            d4est_quad, d4est_factors, error, prob_vecs.local_nodes, NULL, NULL);
    printf("SOLPROBE: u2s %.16e e2s %.16e el2 %.16e\n", u2s, e2s, el2);
    {
      double *ones = P4EST_ALLOC(double, prob_vecs.local_nodes);
      double *Mones = P4EST_ALLOC(double, prob_vecs.local_nodes);
      for (int i=0;i<prob_vecs.local_nodes;i++) ones[i]=1.0;
      double vol = d4est_mesh_compute_l2_norm_sqr(p4est, d4est_ops, d4est_geom,
              d4est_quad, d4est_factors, ones, prob_vecs.local_nodes, NULL, NULL);
      printf("MASSPROBE: ones_M_ones %.16e (should be 1)\n", vol);
      /* per-node dump of error and M*error for element 0 */
      d4est_quadrature_volume_t mo; 
      p4est_tree_t* tree = p4est_tree_array_index(p4est->trees, p4est->first_local_tree);
      p4est_quadrant_t* quad0 = p4est_quadrant_array_index(&tree->quadrants, 0);
      d4est_element_data_t* ed0 = quad0->p.user_data;
      printf("ELEM0: deg %d deg_quad %d\n", ed0->deg, ed0->deg_quad);
      printf("ERR0:"); for (int i=0;i<8;i++) printf(" %.16e", error[i]); printf("\n");
      P4EST_FREE(ones); P4EST_FREE(Mones);
    }
    {
      double *l2arr = P4EST_ALLOC(double, p4est->local_num_quadrants);
      d4est_mesh_compute_l2_norm_sqr(p4est, d4est_ops, d4est_geom,
              d4est_quad, d4est_factors, error, prob_vecs.local_nodes, NULL, l2arr);
      printf("L2ARR0: %.16e %.16e %.16e\n", l2arr[0], l2arr[1], l2arr[2]);
      P4EST_FREE(l2arr);
    }
    {
      FILE *fp = fopen("ref_error.txt","w");
      for (int i=0;i<prob_vecs.local_nodes;i++) fprintf(fp, "%.17e\n", error[i]);
      fclose(fp);
      fp = fopen("ref_u.txt","w");
      for (int i=0;i<prob_vecs.local_nodes;i++) fprintf(fp, "%.17e\n", prob_vecs.u[i]);
      fclose(fp);
    }
    double L2 =
        d4est_norms_fcn_L2(p4est, error, prob_vecs.local_nodes, &L2_ctx, NULL);
    double Linf = d4est_norms_fcn_Linfty(p4est, error, prob_vecs.local_nodes,
                                         NULL, NULL);
    printf("REGRESSION: %d %d %d %.25f %.25f\n",
           (int)p4est->global_num_quadrants, local_sizes.local_nodes,
           local_sizes.local_nodes_quad, L2, Linf);
    fflush(stdout);
    P4EST_FREE(error);
    P4EST_FREE(u_analytic);

    if (level != d4est_amr->num_of_amr_steps) {
      d4est_amr_step(p4est, d4est_ops, d4est_amr, &prob_vecs.u, NULL, NULL,
                     (char *)input_file);
    }
    local_sizes = d4est_mesh_update(
        p4est, &d4est_ghost, d4est_ops, d4est_geom, d4est_quad, d4est_factors,
        init_ext, INITIALIZE_GHOST, INITIALIZE_QUADRATURE_DATA,
        INITIALIZE_GEOMETRY_DATA, INITIALIZE_GEOMETRY_ALIASES,
        d4est_mesh_set_quadratures_after_amr, init_ext);
    prob_vecs.local_nodes = local_sizes.local_nodes;
    prob_vecs.Au = P4EST_REALLOC(prob_vecs.Au, double, prob_vecs.local_nodes);
    prob_vecs.rhs = P4EST_REALLOC(prob_vecs.rhs, double, prob_vecs.local_nodes);
    if (d4est_ghost_data != NULL) {
      d4est_ghost_data_destroy(d4est_ghost_data);
      d4est_ghost_data = NULL;
    }
  }
  printf("HARNESS DONE\n");
  return 0;
}
