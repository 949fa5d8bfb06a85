# Build the native (C++) host library and run the test-suite.
#
# The native library is optional: everything falls back to NumPy when it is
# absent. `make native` produces bblean_tpu/csrc/build/libbblean_native.so.

CXX ?= g++
# Portable baseline (runs on any 2009+ x86-64); AVX-512 popcount paths are
# compiled via per-function target attributes and picked at run time.
CXXFLAGS ?= -O3 -std=c++17 -fPIC -shared -march=x86-64-v2 -funroll-loops
SRC := bblean_tpu/csrc/bblean_native.cpp
OUT := bblean_tpu/csrc/build/libbblean_native.so

.PHONY: native test test-tpu clean

native: $(OUT)

$(OUT): $(SRC)
	mkdir -p $(dir $(OUT))
	$(CXX) $(CXXFLAGS) -o $(OUT) $(SRC)

test:
	python -m pytest tests/ -x -q

# Run the device-kernel + batch-engine tests on the real TPU chip.
# Must run from the repo root (the axon PJRT plugin requires it); the
# sharded multi-device tests skip themselves on a single chip.
test-tpu:
	BBLEAN_TPU_TEST_PLATFORM=axon python -m pytest \
		tests/test_ops.py tests/test_batch_engine.py \
		tests/test_pallas_search_sorted.py -x -q

clean:
	rm -rf bblean_tpu/csrc/build
