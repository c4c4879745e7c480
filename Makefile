# Developer targets (reference has the same surface: test / lint / docs)

.PHONY: test test-fast bench bdm clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

lint:
	python -m flake8 elfi_tpu tests || echo "flake8 not installed (CI runs it)"

bench:
	python bench.py

# build the C++ birth-death-mutation example simulator
bdm:
	$(MAKE) -C elfi_tpu/models/cpp

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -rf .pytest_cache
