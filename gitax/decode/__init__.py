from .beam import BeamSearchConfig, beam_search
from .greedy import greedy_search
from .trie import TokenTrie, build_vocab_trie, trie_greedy_search
