.PHONY: test bench lint native clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	python -c "from robosat_tpu import native; assert native.load() is not None; print('native geometry OK')"

lint:
	python -m compileall -q robosat_tpu tests bench.py __graft_entry__.py

clean:
	rm -f robosat_tpu/native/_geometry.so
	find . -name __pycache__ -type d -exec rm -rf {} +
