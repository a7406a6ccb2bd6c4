from . import plotting, visualize
