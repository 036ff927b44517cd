# LENS-TPU development targets

.PHONY: test bench native example infer train sweep serve stream dryrun clean

native:
	g++ -O3 -shared -fPIC -o native/liblens_events.so native/lens_events.cpp

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

infer:
	python main.py --sim_mat --matching --PR_curve

train:
	python main.py --train_model

sweep:
	python optimizer.py --n_trials 8

serve:
	python -m lens_tpu.runtime.serve --port 8471

stream:
	python main.py --event_driven

dryrun:
	python __graft_entry__.py --dryrun

example:
	python examples/full_workflow.py

clean:
	rm -rf .jax_cache lens/output native/liblens_events.so
	find . -name __pycache__ -type d -exec rm -rf {} +
