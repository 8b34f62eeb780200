#!/bin/bash
set -eu
cd "$(dirname "$0")/.."
mkdir -p refbuild && cd refbuild
for t in libsc-2.8.3 p4est-2.8 zlog-1.2.15; do
  [ -d $t ] || tar xzf /root/reference/third_party/$t.tar.gz
done
cmake -S libsc-2.8.3 -B sc-build -DCMAKE_INSTALL_PREFIX=$PWD/install -DCMAKE_BUILD_TYPE=Release -DBUILD_SHARED_LIBS=OFF -Dmpi=OFF -DCMAKE_C_FLAGS=-fPIC -G Ninja
ninja -C sc-build install
cmake -S p4est-2.8 -B p4est-build -DCMAKE_INSTALL_PREFIX=$PWD/install -DCMAKE_BUILD_TYPE=Release -DBUILD_SHARED_LIBS=OFF -Dmpi=OFF -DCMAKE_PREFIX_PATH=$PWD/install -DCMAKE_C_FLAGS=-fPIC -G Ninja
ninja -C p4est-build install
(cd zlog-1.2.15 && make -j8 && make PREFIX=$PWD/../install install)
