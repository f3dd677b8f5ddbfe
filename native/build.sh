#!/usr/bin/env bash
# Build the native runtime pieces into tpuslam/io/_native/.
set -euo pipefail
cd "$(dirname "$0")"
OUT=../tpuslam/io/_native
mkdir -p "$OUT"
g++ -O3 -march=native -std=c++17 -shared -fPIC dataloader.cpp \
    -I/usr/include/opencv4 \
    -lopencv_core -lopencv_imgcodecs -lpthread \
    -o "$OUT/libtpuslam_dataloader.so"
echo "built $OUT/libtpuslam_dataloader.so"
g++ -O3 -march=native -std=c++17 -shared -fPIC vocab_loader.cpp \
    -o "$OUT/libtpuslam_vocab.so"
echo "built $OUT/libtpuslam_vocab.so"
