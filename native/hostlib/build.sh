#!/bin/sh
# Build the host runtime library against the installed runtime .so files
# (no dev headers exist in this environment; prototypes are local).
set -e
cd "$(dirname "$0")"
gcc -O3 -fPIC -shared cls_host.c -o libcls_host.so \
    -l:libgmp.so.10 -l:libcrypto.so.3
echo "built $(pwd)/libcls_host.so"
