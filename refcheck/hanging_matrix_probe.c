/* PROVENANCE: new thin harness patterned after the reference's
 * /root/reference/src/Tests/Unit/d4est_test_laplacian_symmetry.c
 * (setup sequence) and driven through the reference's own
 * d4est_solver_full_matrix (Solver/d4est_solver_full_matrix.c) —
 * ground-truth oracle that dense-assembles the reference SIPG operator
 * on a HANGING mesh (one corner quadrant refined) and dumps it with the
 * element layout, so every hanging-face convention (mortar projections,
 * the x0.5 term2 scaling at d4est_laplacian_flux_sipg.c:789, penalty-h
 * modes on mortars) can be matched entry-by-entry by disco4est_tpu's
 * tests.  Part of the refcheck oracle, NOT of disco4est_tpu; never
 * imported by the framework.
 *
 * Usage: hanging_matrix_probe <options.input> <out.txt> [refine_id]
 * Output format:
 *   ELEMENTS <num>
 *   <id> <tree> <q0> <q1> <q2> <dq> <deg> <nodal_stride>   (per element)
 *   NODES <local_nodes>
 *   MATRIX
 *   <N*N entries, row-major a[i*N+j], one per line, %.18e>
 */
#include <pXest.h>
#include <stdio.h>
#include <stdlib.h>
#include <zlog.h>
#include <d4est_quadrature.h>
#include <d4est_element_data.h>
#include <d4est_geometry.h>
#include <d4est_mesh.h>
#include <d4est_ghost.h>
#include <d4est_ghost_data.h>
#include <d4est_linalg.h>
#include <d4est_mortars.h>
#include <d4est_amr.h>
#include <d4est_laplacian.h>
#include <d4est_laplacian_flux.h>
#include <d4est_solver_full_matrix.h>
#include <d4est_util.h>

static int refine_target = 0;
static int refine_counter = 0;

static int
refine_one_fn(p4est_t *p4est, p4est_topidx_t tree, p4est_quadrant_t *q)
{
  (void)p4est; (void)tree; (void)q;
  return (refine_counter++ == refine_target);
}

static double
zero_bc_fcn(double x, double y,
#if (P4EST_DIM)==3
            double z,
#endif
            void *user)
{
  (void)x; (void)y;
#if (P4EST_DIM)==3
  (void)z;
#endif
  (void)user;
  return 0.;
}

static void
probe_apply_lhs(p4est_t *p4est, d4est_ghost_t *ghost,
                d4est_ghost_data_t *ghost_data,
                d4est_elliptic_data_t *prob_vecs,
                d4est_operators_t *d4est_ops, d4est_geometry_t *d4est_geom,
                d4est_quadrature_t *d4est_quad,
                d4est_mesh_data_t *d4est_factors, void *user)
{
  d4est_laplacian_flux_data_t *flux_data = user;
  d4est_laplacian_apply_aij(p4est, ghost, ghost_data, prob_vecs, flux_data,
                            d4est_ops, d4est_geom, d4est_quad, d4est_factors,
                            0);
}

int main(int argc, char *argv[])
{
  sc_MPI_Comm mpicomm = sc_MPI_COMM_WORLD;
  if (zlog_init("logging.conf") != 0) {
    printf("zlog init failed\n");
    return 1;
  }
  p4est_init(NULL, SC_LP_ERROR);
  const char *input_file = (argc >= 2) ? argv[1] : "options.input";
  const char *out_file = (argc >= 3) ? argv[2] : "hanging_matrix.txt";
  refine_target = (argc >= 4) ? atoi(argv[3]) : 0;

  zlog_category_t *c_geom = zlog_get_category("d4est_geometry");
  d4est_geometry_t *d4est_geom =
      d4est_geometry_new(0, (char *)input_file, "geometry", c_geom);
  d4est_mesh_initial_extents_t *init_ext =
      d4est_mesh_initial_extents_parse((char *)input_file, d4est_geom);
  d4est_operators_t *d4est_ops = d4est_ops_init(init_ext->max_degree > 7 ? init_ext->max_degree : 7);

  p4est_t *p4est = p4est_new_ext(
      mpicomm, d4est_geom->p4est_conn, init_ext->min_quadrants,
      init_ext->min_level, init_ext->fill_uniform,
      sizeof(d4est_element_data_t), NULL, NULL);
  p4est_partition(p4est, 1, NULL);
  p4est_balance(p4est, P4EST_CONNECT_FULL, NULL);

  /* refine exactly one quadrant (Morton id = refine_target), then 2:1
     balance: the canonical smallest hanging mesh */
  if (refine_target >= 0) {
    refine_counter = 0;
    p4est_refine(p4est, 0, refine_one_fn, NULL);
    p4est_balance(p4est, P4EST_CONNECT_FULL, NULL);
  }

  d4est_ghost_t *d4est_ghost = NULL;
  d4est_mesh_data_t *d4est_factors = d4est_mesh_data_init(p4est);
  d4est_quadrature_t *d4est_quad = d4est_quadrature_new(
      p4est, d4est_ops, d4est_geom, (char *)input_file, "quadrature");
  d4est_mesh_local_sizes_t local_sizes = d4est_mesh_update(
      p4est, &d4est_ghost, d4est_ops, d4est_geom, d4est_quad, d4est_factors,
      init_ext, INITIALIZE_GHOST, INITIALIZE_QUADRATURE_DATA,
      INITIALIZE_GEOMETRY_DATA, INITIALIZE_GEOMETRY_ALIASES,
      d4est_mesh_set_initial_extents, (void *)init_ext);
  int local_nodes = local_sizes.local_nodes;

  FILE *out = fopen(out_file, "w");
  if (!out) { printf("cannot open %s\n", out_file); return 1; }

  fprintf(out, "ELEMENTS %d\n", p4est->local_num_quadrants);
  for (p4est_topidx_t tt = p4est->first_local_tree;
       tt <= p4est->last_local_tree; ++tt) {
    p4est_tree_t *tree = p4est_tree_array_index(p4est->trees, tt);
    sc_array_t *tq = &tree->quadrants;
    for (size_t qq = 0; qq < tq->elem_count; ++qq) {
      p4est_quadrant_t *quad = p4est_quadrant_array_index(tq, qq);
      d4est_element_data_t *ed = quad->p.user_data;
      fprintf(out, "%d %d %lld %lld %lld %lld %d %d\n", ed->id,
              (int)ed->tree, (long long)ed->q[0], (long long)ed->q[1],
#if (P4EST_DIM)==3
              (long long)ed->q[2],
#else
              0LL,
#endif
              (long long)ed->dq, ed->deg, ed->nodal_stride);
    }
  }
  fprintf(out, "NODES %d\n", local_nodes);

  d4est_field_type_t field_type = NODAL;
  d4est_ghost_data_t *d4est_ghost_data =
      d4est_ghost_data_init(p4est, d4est_ghost, &field_type, 1);

  d4est_laplacian_dirichlet_bc_t bc_data;
  bc_data.dirichlet_fcn = zero_bc_fcn;
  bc_data.eval_method = EVAL_BNDRY_FCN_ON_LOBATTO;
  d4est_laplacian_flux_data_t *flux_data =
      d4est_laplacian_flux_new(p4est, (char *)input_file, BC_DIRICHLET,
                               &bc_data);

  d4est_elliptic_data_t prob_vecs;
  prob_vecs.Au = P4EST_ALLOC(double, local_nodes);
  prob_vecs.u = P4EST_ALLOC(double, local_nodes);
  prob_vecs.local_nodes = local_nodes;
  prob_vecs.field_types = &field_type;
  prob_vecs.num_of_fields = 1;

  d4est_elliptic_eqns_t prob_fcns;
  prob_fcns.build_residual = NULL;
  prob_fcns.apply_lhs = probe_apply_lhs;
  prob_fcns.user = flux_data;

  double *a_mat = P4EST_ALLOC(double, (size_t)local_nodes * local_nodes);
  d4est_solver_full_matrix(p4est, d4est_ghost, d4est_ghost_data, &prob_fcns,
                           &prob_vecs, d4est_ops, d4est_geom, d4est_quad,
                           d4est_factors, a_mat);

  fprintf(out, "MATRIX\n");
  /* d4est_linalg_set_column is row-major (A[M*i + col] = column[i]), so
     a_mat[i*N + j] = (A e_j)[i] = A[i][j] already */
  for (int i = 0; i < local_nodes; i++)
    for (int j = 0; j < local_nodes; j++)
      fprintf(out, "%.18e\n", a_mat[(size_t)i * local_nodes + j]);
  fclose(out);
  printf("HARNESS DONE nodes=%d\n", local_nodes);
  return 0;
}
