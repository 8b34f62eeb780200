#ifndef HDF5_STUB_H
#define HDF5_STUB_H
typedef long long hid_t; typedef int herr_t; typedef unsigned long long hsize_t;
#define H5T_NATIVE_DOUBLE ((hid_t)1)
#define H5T_NATIVE_INT ((hid_t)2)
#define H5T_NATIVE_FLOAT ((hid_t)3)
#endif
