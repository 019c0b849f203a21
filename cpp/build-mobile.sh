#!/usr/bin/env bash
# Build the native data plane as static archives for mobile embedding.
#
# Counterpart of the reference's build-ios-lib.sh (universal xcframework from
# a Rust staticlib + cbindgen header): here the C ABI lives in a2m_native.h
# (extract_midi_events / free_midi_events, python.rs cbinds.rs parity) and the
# archive is produced per target triple.  On a mac host with Xcode this cross-
# compiles for iOS; elsewhere it builds the host-arch static lib so the ABI
# stays continuously exercised by CI/tests.
set -euo pipefail
cd "$(dirname "$0")"

build_one() {
  local name="$1"; shift
  local outdir="build-mobile/$name"
  mkdir -p "$outdir"
  c++ -O3 -std=c++17 -fno-math-errno "$@" -c a2m_native.cpp -o "$outdir/a2m_native.o"
  ar rcs "$outdir/liba2m_native.a" "$outdir/a2m_native.o"
  echo "built $outdir/liba2m_native.a"
}

if [[ "$(uname)" == "Darwin" ]] && xcrun --sdk iphoneos --show-sdk-path >/dev/null 2>&1; then
  IOS_SDK="$(xcrun --sdk iphoneos --show-sdk-path)"
  SIM_SDK="$(xcrun --sdk iphonesimulator --show-sdk-path)"
  build_one ios-arm64 -target arm64-apple-ios14.0 -isysroot "$IOS_SDK"
  build_one ios-sim-arm64 -target arm64-apple-ios14.0-simulator -isysroot "$SIM_SDK"
  build_one ios-sim-x86_64 -target x86_64-apple-ios14.0-simulator -isysroot "$SIM_SDK"
  mkdir -p build-mobile/sim-universal
  lipo -create build-mobile/ios-sim-*/liba2m_native.a \
    -output build-mobile/sim-universal/liba2m_native.a
  rm -rf build-mobile/A2MNative.xcframework
  xcodebuild -create-xcframework \
    -library build-mobile/ios-arm64/liba2m_native.a -headers . \
    -library build-mobile/sim-universal/liba2m_native.a -headers . \
    -output build-mobile/A2MNative.xcframework
  echo "built build-mobile/A2MNative.xcframework"
else
  build_one host -fPIC
fi
