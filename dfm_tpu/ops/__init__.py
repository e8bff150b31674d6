from . import cost_volume, frustum, grid_sample, resize

__all__ = ['cost_volume', 'frustum', 'grid_sample', 'resize']
