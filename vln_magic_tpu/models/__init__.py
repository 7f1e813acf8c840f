from .vlnbert import DualScaleVLNBert, Critic
