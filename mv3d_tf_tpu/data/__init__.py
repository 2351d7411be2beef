"""Data pipeline: KITTI imdb, synthetic fixtures, prefetching loader."""
