/* Minimal PETSc type stubs: the petsc-free subset of d4est only uses these
   types in struct fields / prototypes, never calls PETSc functions. */
#ifndef PETSTUB_COMMON_H
#define PETSTUB_COMMON_H
typedef void* SNES; typedef void* KSP; typedef void* Vec; typedef void* Mat;
typedef void* PC; typedef int PetscErrorCode; typedef int PetscInt;
typedef double PetscReal; typedef double PetscScalar; typedef int PetscBool;
typedef void* PetscViewer; typedef int MatStructure; typedef void* SNESLineSearch;
#endif
