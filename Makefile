# Common workflows. All test/dev targets run on CPU (virtual 8-device mesh);
# train/bench use the TPU.

.PHONY: test test-fast native smoke bench dryrun previews clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_parallel.py

native:
	$(MAKE) -C chess_vision_tpu/native libcvtdecoder.so

# CPU-runnable end-to-end smoke: tiny dataset -> 2-epoch train -> eval -> predict
smoke:
	JAX_PLATFORMS=cpu python -m chess_vision_tpu.datagen.generate \
	    --out /tmp/cvt_smoke --count 24 --size 256 --seed 42 --workers 1
	JAX_PLATFORMS=cpu python train.py --config configs/square.yaml \
	    --set training.epochs=2 data.max_samples=50 data.num_workers=2 \
	          training.batch_size=8 data.train_dir=/tmp/cvt_smoke \
	          model.pretrained=false checkpointing.save_dir=/tmp/cvt_ckpt \
	          logging.tensorboard_dir=/tmp/cvt_runs
	JAX_PLATFORMS=cpu python evaluate.py --checkpoint /tmp/cvt_ckpt/latest.ckpt \
	    --test-dir /tmp/cvt_smoke --max-samples 16 --batch-size 8
	JAX_PLATFORMS=cpu python predict.py --checkpoint /tmp/cvt_ckpt/latest.ckpt \
	    --image /tmp/cvt_smoke/000000.jpg

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python __graft_entry__.py dryrun 8

previews:
	python -m chess_vision_tpu.datagen.preview --out previews/

clean:
	rm -rf chess_vision_tpu/native/libcvtdecoder.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
