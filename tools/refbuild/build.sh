#!/bin/bash
# Build the reference CPU path tracer headlessly (no GL/GLFW/freetype) for
# golden-image parity testing and baseline measurement.
# Usage: tools/refbuild/build.sh [output-binary]
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference/pathtracer}
OUT=${1:-/tmp/ref_pathtracer}
STAGE=$(mktemp -d)
mkdir -p $STAGE/GL $STAGE/GLFW
cp $HERE/glew_stub.h $STAGE/GL/glew.h
cp $HERE/glfw3_stub.h $STAGE/GLFW/glfw3.h
if [ "${THIN_LENS:-0}" = "1" ]; then
  # thin-lens parity variant: the switch is a hardcoded #define
  # (pathtracer.h:6), so stage a patched copy of the source tree
  cp -r $REF/src $STAGE/src
  ln -s $REF/CGL $STAGE/CGL
  sed -i 's/#define THIN_LENS 0/#define THIN_LENS 1/' $STAGE/src/pathtracer.h
  REF=$STAGE
fi
SRCS="$REF/src/main.cpp $REF/src/application.cpp $REF/src/camera.cpp \
  $REF/src/bbox.cpp $REF/src/bsdf.cpp $REF/src/bvh.cpp \
  $REF/src/halfEdgeMesh.cpp $REF/src/meshEdit.cpp $REF/src/pathtracer.cpp \
  $REF/src/sampler.cpp $REF/src/part1_code.cpp $REF/src/misc/sphere_drawing.cpp \
  $(ls $REF/src/collada/*.cpp) $(ls $REF/src/dynamic_scene/*.cpp) \
  $(ls $REF/src/static_scene/*.cpp)"
CGLS="$REF/CGL/src/vector2D.cpp $REF/CGL/src/vector3D.cpp $REF/CGL/src/vector4D.cpp \
  $REF/CGL/src/matrix3x3.cpp $REF/CGL/src/matrix4x4.cpp $REF/CGL/src/quaternion.cpp \
  $REF/CGL/src/complex.cpp $REF/CGL/src/color.cpp $REF/CGL/src/spectrum.cpp \
  $REF/CGL/src/base64.cpp $REF/CGL/src/lodepng.cpp $REF/CGL/src/tinyxml2.cpp"
g++ -O3 -std=c++11 -w -I$STAGE -I$REF/CGL/include -I$REF/CGL/include/CGL -I$REF/src \
  $SRCS $CGLS $HERE/src/stubs.cpp -o $OUT -lpthread -lm
echo "built $OUT"
