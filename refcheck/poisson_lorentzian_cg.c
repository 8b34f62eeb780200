/* PROVENANCE: new thin harness re-expressing the setup of the reference's
 * /root/reference/src/driver.c + src/Problems/Poisson/poisson_lorentzian*.c
 * against the reference's own core objects (refcheck oracle; NOT part of
 * disco4est_tpu and never imported by it).
 *
 * Ground-truth harness: reference d4est Poisson-Lorentzian, level 0.
 *
 * Reproduces the level-0 line of Tests/Regression/
 * d4est_test_poisson_lorentzian.sh: "104 832 832 2706.02899845..."
 * (13-tree compactified cubed sphere, deg 1, Dirichlet BC, legendre
 * quadrature).  The reference driver solves with PETSc fcg + MG PC to
 * atol 1e-15; the linear solution at that tolerance is solver-
 * independent, so the in-house CG gives the same digits.
 */
#include <pXest.h>
#include <stdio.h>
#include <d4est_geometry.h>
#include <d4est_geometry_cubed_sphere.h>
#include <d4est_mesh.h>
#include <d4est_element_data.h>
#include <d4est_ghost.h>
#include <d4est_ghost_data.h>
#include <d4est_quadrature.h>
#include <d4est_operators.h>
#include <d4est_laplacian_with_opt.h>
#include <d4est_laplacian_with_opt_flux.h>
#include <d4est_linalg.h>
#include <d4est_solver_cg.h>
#include <d4est_norms.h>
#include <d4est_util.h>
#include <d4est_xyz_functions.h>
#include <zlog.h>
#include <poisson_lorentzian_fcns_with_opt.h>

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
  lorentzian_params_t lorentzian_params;
  lorentzian_params.R_surface =
      ((d4est_geometry_cubed_sphere_attr_t *)d4est_geom->user)->R2;

  d4est_laplacian_with_opt_dirichlet_bc_t bc_lhs = {
      .dirichlet_fcn = zero_fcn,
      .eval_method = eval_method,
      .user = &lorentzian_params};
  d4est_laplacian_with_opt_dirichlet_bc_t bc_rhs = {
      .dirichlet_fcn = poisson_lorentzian_boundary_fcn,
      .eval_method = eval_method,
      .user = &lorentzian_params};
  d4est_laplacian_with_opt_flux_data_t *flux_lhs =
      d4est_laplacian_with_opt_flux_new(p4est, (char *)input_file,
                                        BC_DIRICHLET, &bc_lhs);
  d4est_laplacian_with_opt_flux_data_t *flux_rhs =
      d4est_laplacian_with_opt_flux_new(p4est, (char *)input_file,
                                        BC_DIRICHLET, &bc_rhs);

  problem_ctx_t ctx = {.flux_data_for_apply_lhs = flux_lhs,
                       .flux_data_for_build_rhs = flux_rhs};
  d4est_elliptic_eqns_t prob_fcns = {
      .build_residual = poisson_lorentzian_build_residual,
      .apply_lhs = poisson_lorentzian_apply_lhs,
      .user = &ctx};

  d4est_elliptic_data_t prob_vecs;
  prob_vecs.Au = P4EST_ALLOC(double, init_ext->initial_nodes);
  prob_vecs.u = P4EST_ALLOC(double, init_ext->initial_nodes);
  prob_vecs.rhs = P4EST_ALLOC(double, init_ext->initial_nodes);
  prob_vecs.local_nodes = init_ext->initial_nodes;

  d4est_mesh_init_field(p4est, prob_vecs.u, poisson_lorentzian_initial_guess,
                        d4est_ops, d4est_geom, d4est_factors,
                        INIT_FIELD_ON_LOBATTO, NULL);
  d4est_field_type_t field_type = NODAL;
  d4est_ghost_data_t *d4est_ghost_data =
      d4est_ghost_data_init(p4est, d4est_ghost, &field_type, 1);

  d4est_laplacian_with_opt_build_rhs_with_strong_bc(
      p4est, d4est_ghost, d4est_ghost_data, d4est_ops, d4est_geom,
      d4est_quad, d4est_factors, &prob_vecs, flux_rhs, prob_vecs.rhs,
      poisson_lorentzian_rhs_fcn, INIT_FIELD_ON_LOBATTO, &ctx, 0);

  /* ordering-invariant probes: geometry volume, rhs norm, operator action
   * on the analytic field */
  {
    double *ones = P4EST_ALLOC(double, prob_vecs.local_nodes);
    for (int i = 0; i < prob_vecs.local_nodes; i++) ones[i] = 1.0;
    double vol = d4est_mesh_compute_l2_norm_sqr(
        p4est, d4est_ops, d4est_geom, d4est_quad, d4est_factors, ones,
        prob_vecs.local_nodes, NULL, NULL);
    double rhs2 = 0.0;
    for (int i = 0; i < prob_vecs.local_nodes; i++)
      rhs2 += prob_vecs.rhs[i] * prob_vecs.rhs[i];
    double *probe = P4EST_ALLOC(double, prob_vecs.local_nodes);
    d4est_mesh_init_field(p4est, probe, poisson_lorentzian_analytic_solution,
                          d4est_ops, d4est_geom, d4est_factors,
                          INIT_FIELD_ON_LOBATTO, NULL);
    double *save_u = prob_vecs.u, *save_Au = prob_vecs.Au;
    prob_vecs.u = probe;
    prob_vecs.Au = P4EST_ALLOC(double, prob_vecs.local_nodes);
    d4est_elliptic_eqns_apply_lhs(p4est, d4est_ghost, d4est_ghost_data,
                                  &prob_fcns, &prob_vecs, d4est_ops,
                                  d4est_geom, d4est_quad, d4est_factors);
    double Au2 = 0.0, uAu = 0.0, rdotp = 0.0;
    for (int i = 0; i < prob_vecs.local_nodes; i++) {
      Au2 += prob_vecs.Au[i] * prob_vecs.Au[i];
      uAu += probe[i] * prob_vecs.Au[i];
      rdotp += prob_vecs.rhs[i] * probe[i];
    }
    printf("PROBE: vol %.16e rhs2 %.16e rdotp %.16e Au2 %.16e uAu %.16e\n",
           vol, rhs2, rdotp, Au2, uAu);
    /* per-element: centroid + sum(Au^2) on the analytic probe field */
    {
      FILE *fp = fopen("ref_lorentzian_elems.txt", "w");
      for (p4est_topidx_t tt = p4est->first_local_tree;
           tt <= p4est->last_local_tree; ++tt) {
        p4est_tree_t *tree = p4est_tree_array_index(p4est->trees, tt);
        for (size_t q = 0; q < tree->quadrants.elem_count; ++q) {
          p4est_quadrant_t *quad =
              p4est_quadrant_array_index(&tree->quadrants, q);
          d4est_element_data_t *ed = quad->p.user_data;
          int vn = d4est_lgl_get_nodes(P4EST_DIM, ed->deg);
          double cx = 0, cy = 0, cz = 0, au2 = 0, rhse = 0;
          for (int i = 0; i < vn; i++) {
            cx += d4est_factors->xyz[ed->nodal_stride + i];
            cy += d4est_factors->xyz[local_sizes.local_nodes +
                                     ed->nodal_stride + i];
            cz += d4est_factors->xyz[2 * local_sizes.local_nodes +
                                     ed->nodal_stride + i];
            au2 += prob_vecs.Au[ed->nodal_stride + i] *
                   prob_vecs.Au[ed->nodal_stride + i];
            rhse += prob_vecs.rhs[ed->nodal_stride + i] *
                    prob_vecs.rhs[ed->nodal_stride + i];
          }
          fprintf(fp, "%.10e %.10e %.10e %.16e %.16e\n", cx / vn, cy / vn,
                  cz / vn, au2, rhse);
        }
      }
      fclose(fp);
    }
    P4EST_FREE(prob_vecs.Au);
    prob_vecs.u = save_u;
    prob_vecs.Au = save_Au;
    P4EST_FREE(probe);
    P4EST_FREE(ones);
  }

  d4est_solver_cg_params_t cg_params;
  d4est_solver_cg_input(p4est, (char *)input_file, "d4est_solver_cg",
                        "[D4EST_SOLVER_CG]", &cg_params);
  d4est_solver_cg_solve(p4est, &prob_vecs, &prob_fcns, &d4est_ghost,
                        &d4est_ghost_data, d4est_ops, d4est_geom, d4est_quad,
                        d4est_factors, &cg_params, NULL);

  d4est_norms_fcn_L2_ctx_t L2_ctx = {.p4est = p4est,
                                     .d4est_ops = d4est_ops,
                                     .d4est_geom = d4est_geom,
                                     .d4est_quad = d4est_quad,
                                     .d4est_factors = d4est_factors};
  double *u_analytic = P4EST_ALLOC(double, prob_vecs.local_nodes);
  d4est_mesh_init_field(p4est, u_analytic,
                        poisson_lorentzian_analytic_solution, d4est_ops,
                        d4est_geom, d4est_factors, INIT_FIELD_ON_LOBATTO,
                        NULL);
  double *error = P4EST_ALLOC(double, prob_vecs.local_nodes);
  d4est_linalg_vec_fabsdiff(prob_vecs.u, u_analytic, error,
                            prob_vecs.local_nodes);
  {
    double l2u = d4est_mesh_compute_l2_norm_sqr(
        p4est, d4est_ops, d4est_geom, d4est_quad, d4est_factors,
        prob_vecs.u, prob_vecs.local_nodes, NULL, NULL);
    double l2a = d4est_mesh_compute_l2_norm_sqr(
        p4est, d4est_ops, d4est_geom, d4est_quad, d4est_factors,
        u_analytic, prob_vecs.local_nodes, NULL, NULL);
    double l2e = d4est_mesh_compute_l2_norm_sqr(
        p4est, d4est_ops, d4est_geom, d4est_quad, d4est_factors,
        error, prob_vecs.local_nodes, NULL, NULL);
    printf("L2PROBE: l2u %.16e l2a %.16e l2e %.16e\n", l2u, l2a, l2e);
  }
  double L2 =
      d4est_norms_fcn_L2(p4est, error, prob_vecs.local_nodes, &L2_ctx, NULL);
  double Linf = d4est_norms_fcn_Linfty(p4est, error, prob_vecs.local_nodes,
                                       NULL, NULL);
  printf("REGRESSION: %d %d %d %.25f %.25f\n",
         (int)p4est->global_num_quadrants, local_sizes.local_nodes,
         local_sizes.local_nodes_quad, L2, Linf);
  {
    FILE *fp = fopen("ref_lorentzian_u.txt", "w");
    for (int i = 0; i < prob_vecs.local_nodes; i++)
      fprintf(fp, "%.17e %.17e %.17e %.17e %.17e\n",
              d4est_factors->xyz[i],
              d4est_factors->xyz[prob_vecs.local_nodes + i],
              d4est_factors->xyz[2 * prob_vecs.local_nodes + i],
              prob_vecs.u[i], prob_vecs.rhs[i]);
    fclose(fp);
  }
  printf("HARNESS DONE\n");
  return 0;
}
