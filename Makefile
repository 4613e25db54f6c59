# sregex-tpu build/test driver (analog of the reference Makefile).

PY ?= python

.PHONY: all native test conformance bench clean

all: native

# native host runtime (csrc/sre_host.cpp); also built lazily on first
# use by sregex_tpu/native.py
native:
	g++ -O3 -march=native -shared -fPIC -o csrc/libsrehost.so csrc/sre_host.cpp

test:
	$(PY) -m pytest tests/ -q

# full byte-exact differential run against the reference binary (needs
# /tmp/refbuild/sregex-cli; dev-only)
conformance:
	$(PY) tests/diff_suite.py

bench:
	$(PY) bench.py

# on-hardware smoke suite: one pattern per device tier vs host
# oracles (~10-20 min cold on the relay); `make smoke-cpu` runs the
# same cases on the virtual CPU mesh
smoke:
	$(PY) tests/smoke_tpu.py

smoke-cpu:
	$(PY) tests/smoke_tpu.py --cpu

clean:
	rm -f csrc/libsrehost.so
	find . -name __pycache__ -type d -exec rm -rf {} +

# AddressSanitizer build of the native engines + differential stress
# run (the analog of the reference's `make valtest` valgrind mode)
asan:
	g++ -O1 -g -fsanitize=address -shared -fPIC -o csrc/libsrepike_asan.so csrc/sre_pike.cpp
	g++ -O1 -g -fsanitize=address -shared -fPIC -o csrc/libsrehost_asan.so csrc/sre_host.cpp
	g++ -O1 -g -fsanitize=address -shared -fPIC -o csrc/libsretdfa_asan.so csrc/sre_tdfa.cpp
	LD_PRELOAD=$$(gcc -print-file-name=libasan.so) \
	LSAN_OPTIONS=suppressions=lsan.suppress $(PY) tests/asan_stress.py

releng:
	$(PY) util/releng.py
