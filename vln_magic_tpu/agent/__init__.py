from .rollout import EpisodeBatch, Rollout, Tables, init_episodes
from .navigator import Navigator, pad_instructions, episodes_from_items
from .evaluator import Evaluator, build_trajectories, submission_format
from .serving import (Candidate, NavDecision, NavServer, NavSession,
                      Observation)
