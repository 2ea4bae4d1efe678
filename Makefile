# Convenience targets (parity with the reference's wrapper Makefile role).

.PHONY: test test-tpu bench report native clean

test:
	python -m pytest tests/ -q

test-tpu:
	SSIM_TPU_TEST_TPU=1 python -m pytest tests/ -q --ignore=tests/test_distributed.py

bench:
	python bench.py

report:
	python -m ssim_tpu.testing.report

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
