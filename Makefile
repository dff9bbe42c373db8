# Round-loop entry points (see docs/BENCHMARKS.md).

.PHONY: test tpu-test bench suite scaling native

test:            ## CPU 8-device virtual-mesh suite (CI default)
	python -m pytest tests/ -q

tpu-test:        ## real-hardware kernel statistics; writes visual_output/tpu_test_log.txt
	sh scripts/run_tpu_tests.sh

bench:           ## driver headline (one JSON line) + kernel_bench.json artifact
	python bench.py

suite:           ## full benchmark suite + committed artifacts
	python -m tsu_tpu.benchmarks.runner
	python scripts/extract_benchmarks.py

scaling:         ## scaling rows on the visible mesh (pod: scripts/pod_scaling.sh)
	python -m tsu_tpu.benchmarks.scaling

native:          ## rebuild the native C++ library
	sh tsu_tpu/native/build.sh
