"""CLI: ``python -m mgdt_yolo_tpu TASK MODE k=v ...``
(the reference's ``yolo`` console entrypoint, yolo/cfg/__init__.py:260)."""
from .cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
