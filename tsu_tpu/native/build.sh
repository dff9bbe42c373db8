#!/bin/sh
# Build the native graph-tools shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libgraph_tools.so graph_tools.cpp
echo "built $(pwd)/libgraph_tools.so"
