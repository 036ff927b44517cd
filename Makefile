# LENS-TPU development targets

.PHONY: test bench bench-large native example example-fleet example-scale \
        example-aer infer infer-bf16 infer-quant train sweep serve stream \
        dryrun clean online-recall chip-sweep chip-sweep-sunset seq-sweep \
        results

native:
	g++ -O3 -shared -fPIC -o native/liblens_events.so native/lens_events.cpp

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

bench-large:
	python bench.py --large

infer:
	python main.py --sim_mat --matching --PR_curve

infer-bf16:
	python main.py --matching --precision bf16

infer-quant:
	python main.py --simulated_speck --matching

train:
	python main.py --train_model

sweep:
	python optimizer.py --n_trials 8

serve:
	python -m lens_tpu.runtime.serve --port 8471

stream:
	python main.py --event_driven

# Online-mode Recall@N (the reference's headline published result type):
# full --event_driven replays at on-chip density over both bundled
# traverses, scored against GT, with the SAD/offline comparison rows.
# Refreshes STREAM_RECALL.json + lens/data/online/*.csv.
online-recall:
	python -m lens_tpu.tools.online_recall --traverse all \
		--json STREAM_RECALL.json --csv_dir lens/data/online \
		--densities 2000,5000,50000 --seeds 1,2,3

# Chip-regime sweep winner: retrains the recorded best trial of the
# feature_multiplier-8 widened-space example sweep (BENCHMARKS.md has the
# campaign; the winner beats dense-frame SAD at EVERY N on the canonical
# seed-0 stream).  Refreshes CHIP_SWEEP.json and the bundled chip-example
# checkpoint.  Deterministic: shared init key (train_seed) + seed-0 stream.
# For a fresh search instead of the recorded winner, drop --trials_json and
# pass --wide --n_trials 8 --feature_multiplier 8.
chip-sweep:
	python -m lens_tpu.tools.chip_sweep --feature_multiplier 8 \
		--trials_json lens_tpu/tools/chip_example_trial.json \
		--save_best --json CHIP_SWEEP.json

# Sunset capacity winner (round-5): retrains the recorded best trial of the
# feature_multiplier-32 capacity sweep (BENCHMARKS.md has the full ladder;
# FM64 regresses, FM32 is the peak) and refreshes CHIP_SWEEP_SUNSET.json +
# the bundled chip-sunset checkpoint.
# Deterministic: shared init key (train_seed) + seed-3 stream synthesis.
chip-sweep-sunset:
	python -m lens_tpu.tools.chip_sweep --traverse sunset --seed 3 \
		--epoch_feat 64 --epoch_out 64 --feature_multiplier 32 \
		--trials_json lens_tpu/tools/chip_sunset_trial.json \
		--save_best --json CHIP_SWEEP_SUNSET.json

# Sequence-window (matched-L) characterization: LENS online/offline vs SAD
# at every L on both traverses (BENCHMARKS.md matched-L section).  Runs on
# the CPU backend (integer streaming dynamics are backend-exact), so it can
# run while the TPU is busy.  Refreshes SEQ_SWEEP.json.  Deterministic.
seq-sweep:
	python -m lens_tpu.tools.seq_sweep --traverse all --seeds 3,0 --cpu \
		--json SEQ_SWEEP.json

dryrun:
	python __graft_entry__.py --dryrun

# One-command reproduction of every committed result artifact (RESULTS.md
# maps each artifact to its command, git SHA, and expected band).  Runs
# sequentially — the tunneled TPU serializes device claims, so never run
# two of these targets concurrently yourself.
results: bench-large online-recall chip-sweep chip-sweep-sunset seq-sweep dryrun
	@echo "regenerated: BENCH_HEADLINE.json BENCH_LARGE.json" \
	      "STREAM_RECALL.json lens/data/online/*.csv CHIP_SWEEP.json" \
	      "CHIP_SWEEP_SUNSET.json SEQ_SWEEP.json"
	@echo "see RESULTS.md for the expected bands"

example:
	python examples/full_workflow.py

example-fleet:
	python examples/fleet_client.py

example-scale:
	python examples/production_scale.py --small

example-aer:
	python examples/aer_batch_eval.py

clean:
	rm -rf .jax_cache lens/output native/liblens_events.so
	find . -name __pycache__ -type d -exec rm -rf {} +
