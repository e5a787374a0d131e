#!/usr/bin/env python
"""1-shot result viewer (reference: http/backend.py, port 17002)."""

from viewer import main

if __name__ == "__main__":
    main(shot=1, port=17002)
