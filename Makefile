.PHONY: native test bench clean

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf build vvc_mip_gpu_tpu/io/_native_ext*.so
