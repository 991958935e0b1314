from .gather import allgather_objects, pack_objects, unpack_objects
from .mesh import make_mesh, shard_batch, replicate

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'allgather_objects',
           'pack_objects', 'unpack_objects']
