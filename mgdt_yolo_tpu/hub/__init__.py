"""HUB integration shims (reference hub/: auth, training session, telemetry).

This environment has zero egress, and the reference's HUB features (heartbeat
thread, checkpoint upload, GA4 events — hub/session.py:69-189, utils.py:145)
are network services. The public surface is preserved as inert stubs so user
code importing them keeps working; every network action logs and no-ops.
The reference's Sentry crash telemetry (yolo/utils/__init__.py:612) is
likewise intentionally not reproduced.
"""
from __future__ import annotations

from ..utils import LOGGER


class Auth:
    def __init__(self, api_key: str = "", verbose: bool = False):
        self.api_key = api_key
        if verbose and not api_key:
            LOGGER.info("HUB auth disabled (offline build)")

    def authenticate(self) -> bool:
        return False


class HUBTrainingSession:
    """Inert stand-in for hub/session.py:16-189."""

    def __init__(self, url: str = ""):
        self.url = url
        self.alive = False
        LOGGER.info("HUB session disabled (offline build)")

    def start_heartbeat(self):
        pass

    def upload_metrics(self, *a, **k):
        pass

    def upload_model(self, *a, **k):
        pass

    def stop(self):
        pass


class Events:
    """Telemetry stub (reference hub/utils.py:145) — records nothing."""

    def __init__(self):
        self.enabled = False

    def __call__(self, *a, **k):
        pass


events = Events()


def login(api_key: str = ""):
    LOGGER.info("HUB login unavailable in this offline build")
    return False


def logout():
    return True
