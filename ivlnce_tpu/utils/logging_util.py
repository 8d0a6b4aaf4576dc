"""Framework logger (habitat logger equivalent with file handler support,
reference run.py:52-55)."""

import logging

logger = logging.getLogger("ivlnce_tpu")
if not logger.handlers:
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("%(asctime)-15s %(levelname)s %(message)s")
    )
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)


def add_filehandler(path: str) -> None:
    handler = logging.FileHandler(path)
    handler.setFormatter(
        logging.Formatter("%(asctime)-15s %(levelname)s %(message)s")
    )
    logger.addHandler(handler)
