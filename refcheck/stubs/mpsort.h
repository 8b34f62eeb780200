#ifndef MPSORT_STUB_H
#define MPSORT_STUB_H
#include <stddef.h>
void mpsort_mpi(void *base, size_t nmemb, size_t elsize,
                void (*radix)(const void *ptr, void *radix, void *arg),
                size_t rsize, void *arg, int comm);
#endif
