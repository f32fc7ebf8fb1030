from . import families
from .dimdist import DimDist
