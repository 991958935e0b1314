from .grounding_metric import GroundingMetric, ground_eval
from .indoor_eval import indoor_eval, IndoorDetMetric
from .occupancy_metric import OccupancyMetric

__all__ = ['GroundingMetric', 'ground_eval', 'indoor_eval',
           'IndoorDetMetric', 'OccupancyMetric']
