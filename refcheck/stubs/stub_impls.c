/* Serial stand-ins for MPI/mpsort/PPF/HDF5/checkpoint used by the
   reference core when built without MPI/PETSc/HDF5 (single-rank ground
   truth harness; digits are rank-count independent by the reference's
   own MPI-invariance contract, Tests/Regression/d4est_test_mpi.sh). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdarg.h>
#include "mpsort.h"
#include "hdf5.h"

static int cmp_double(const void *a, const void *b) {
  double x = *(const double *)a, y = *(const double *)b;
  return (x > y) - (x < y);
}
void mpsort_mpi(void *base, size_t nmemb, size_t elsize,
                void (*radix)(const void *ptr, void *radix, void *arg),
                size_t rsize, void *arg, int comm) {
  (void)radix; (void)rsize; (void)arg; (void)comm;
  if (elsize == sizeof(double)) qsort(base, nmemb, elsize, cmp_double);
  else { fprintf(stderr, "mpsort stub: unsupported elsize\n"); abort(); }
}
int MPI_Comm_size(int comm, int *size) { (void)comm; *size = 1; return 0; }
int MPI_Comm_rank(int comm, int *rank) { (void)comm; *rank = 0; return 0; }
int PPF_Print(int comm, const char *fmt, ...) {
  (void)comm; va_list ap; va_start(ap, fmt);
  char buf[4096]; vsnprintf(buf, sizeof buf, fmt, ap); va_end(ap);
  /* PPF prints "  0: " prefix replacing %N tokens; emulate crudely */
  fputs(buf, stdout); return 0;
}
int PTC_Print(int comm, const char *fmt, ...) {
  (void)comm; va_list ap; va_start(ap, fmt);
  char buf[4096]; vsnprintf(buf, sizeof buf, fmt, ap); va_end(ap);
  fputs(buf, stdout); return 0;
}
void d4est_h5_read_dataset(int r, const char *f, const char *d, hid_t t, void *x)
{ (void)r;(void)f;(void)d;(void)t;(void)x; }
void d4est_h5_write_dataset(int r, const char *f, const char *d, hid_t t, void *x)
{ (void)r;(void)f;(void)d;(void)t;(void)x; }
void d4est_h5_create_dataset(int r, const char *f, const char *d, hid_t t, int s)
{ (void)r;(void)f;(void)d;(void)t;(void)s; }
void d4est_h5_create_file(int r, const char *f) { (void)r;(void)f; }
/* d4est_checkpoint stubs (load paths abort; harness never checkpoints) */
void d4est_checkpoint_check_dataset(void *p4est, const char *prefix,
                                    const char *name, hid_t t, void *sum,
                                    int num) {
  (void)p4est;(void)prefix;(void)name;(void)t;(void)sum;(void)num;
}
void d4est_checkpoint_read_dataset(void *p4est, const char *prefix,
                                   const char *name, hid_t t, void *data,
                                   int num) {
  fprintf(stderr, "checkpoint stub: read not supported\n"); abort();
}
void d4est_checkpoint_save(int num, const char *prefix, void *p4est,
                           void *amr, void *storage, const char **names,
                           hid_t *types, int *sizes, void **fields) {
  (void)num;(void)prefix;(void)p4est;(void)amr;(void)storage;(void)names;
  (void)types;(void)sizes;(void)fields;
}
