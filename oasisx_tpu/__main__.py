"""``python -m oasisx_tpu`` — console entry (reference src/oasisx/__main__.py)."""

from .main import main

if __name__ == "__main__":
    main()
