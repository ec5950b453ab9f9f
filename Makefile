.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} +
