from .scannet_sens import SensReader, extract_scannet_images
from .occupancy import extract_occupancy_annotations

__all__ = ['SensReader', 'extract_scannet_images',
           'extract_occupancy_annotations']
