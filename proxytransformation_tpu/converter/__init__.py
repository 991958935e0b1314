from .scannet_sens import SensReader, extract_scannet_images
from .occupancy import extract_occupancy_annotations
from .rscan import extract_3rscan_images, extract_scene

__all__ = ['SensReader', 'extract_scannet_images',
           'extract_occupancy_annotations', 'extract_3rscan_images',
           'extract_scene']
