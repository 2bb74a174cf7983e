from .beam import BeamSearchConfig, beam_search
from .greedy import greedy_search
