.PHONY: test correctness bench scaling package submit-smoke clean

test:
	python -m pytest tests/ -x -q

correctness:
	python tools/check_correctness.py /root/testdata/sf0.01

bench:
	python bench.py

scaling:
	python tools/bench_scaling.py --passes 2 --rows 100000

# spark-submit --py-files artifact (north rule packaging requirement)
package:
	rm -f dist/engine.zip
	mkdir -p dist
	cd . && zip -qr dist/engine.zip incident_pii_redactor_spark -x '*__pycache__*'

# prove the packaged job runs under spark-submit with --py-files — from a
# NEUTRAL cwd so the package can only resolve through the zip
submit-smoke: package
	python -c "from incident_pii_redactor_spark.sources.pages import write_pages_parquet; import os; os.makedirs('/tmp/submit_smoke', exist_ok=True); write_pages_parquet('/tmp/submit_smoke/pages.parquet', 500)"
	rm -rf /tmp/submit_smoke/out /tmp/submit_smoke/mf
	cd /tmp/submit_smoke && spark-submit --master 'local[8]' \
	  --py-files $(CURDIR)/dist/engine.zip \
	  --conf spark.ui.enabled=false \
	  $(CURDIR)/jobs/scrub.py --input /tmp/submit_smoke/pages.parquet \
	  --output /tmp/submit_smoke/out --manifest /tmp/submit_smoke/mf \
	  --n-buckets 4 --bucket-group-size 4 --salt --from-html

clean:
	rm -rf dist .bench_cache .pytest_cache
