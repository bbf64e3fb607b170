.PHONY: dist test bench scaling clean

dist:
	rm -f dist/elasticsearch_eslib_spark.zip
	mkdir -p dist
	cd . && zip -qr dist/elasticsearch_eslib_spark.zip elasticsearch_eslib_spark \
		-x '*__pycache__*'
	@echo "dist/elasticsearch_eslib_spark.zip ready for spark-submit --py-files"

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

scaling:
	python bench_scaling.py

clean:
	rm -rf dist .pytest_cache tests/.fixtures BENCH/.fixtures
