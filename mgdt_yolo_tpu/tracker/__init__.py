from .bot_sort import BOTSORT, BOTrack
from .byte_tracker import BYTETracker, STrack
from .track import register_tracker

__all__ = ["BYTETracker", "BOTSORT", "STrack", "BOTrack", "register_tracker"]
