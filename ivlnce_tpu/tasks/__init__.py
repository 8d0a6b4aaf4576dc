from ivlnce_tpu.tasks import dataset, dtw, episode_iterator, measures, sensors, tour_ndtw

__all__ = ["dataset", "dtw", "episode_iterator", "measures", "sensors", "tour_ndtw"]
