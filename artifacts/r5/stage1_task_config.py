import geosplatting_tpu.engine.train_task
import pathlib

task = geosplatting_tpu.engine.train_task.GeoSplatTrainTask(dataset_path=pathlib.Path('data/Synthetic4Relight/twosphere'), experiment_name='geosplat-s4r-twosphere', scene_scale=1.0, pairs_budget=1600000, max_render_faces=131072)
