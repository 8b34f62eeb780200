/* PROVENANCE: thin main deriving from (and #include-ing) the reference's
 * /root/reference/src/Problems/TwoPunctures/
 *   two_punctures_cactus_diff_geom_estimator_global.c
 * — ground-truth oracle for the TwoPunctures 7-tree regression
 * (Tests/Regression/d4est_test_twopunctures.sh: grep
 * "56.0000000000000000 0.00042501315", num_of_amr_steps = 0).
 *
 * Compiles the ACTUAL regression problem driver against the PETSc-free
 * core; petsc_solver_stubs.c forwards SNES/KSP to the in-house
 * Newton + FCG.  Part of the refcheck oracle, NOT of disco4est_tpu;
 * never imported by the framework.
 */
#include <pXest.h>
#include <stdio.h>
#include <zlog.h>

#include "tp_probe_body.c"

extern const char *g_refcheck_input_file;

int main(int argc, char *argv[]) {
  sc_MPI_Comm mpicomm = sc_MPI_COMM_WORLD;
  if (zlog_init("logging.conf") != 0) {
    printf("zlog init failed\n");
    return 1;
  }
  p4est_init(NULL, SC_LP_ERROR);
  const char *input_file = (argc == 2) ? argv[1] : "options.input";
  g_refcheck_input_file = input_file;

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

  problem_init(p4est, &d4est_ghost, d4est_ops, d4est_geom, d4est_quad,
               d4est_factors, init_ext, input_file, mpicomm);
  printf("HARNESS DONE\n");
  return 0;
}
