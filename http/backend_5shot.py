#!/usr/bin/env python
"""5-shot result viewer (reference: http/backend_5shot.py, port 17003)."""

from viewer import main

if __name__ == "__main__":
    main(shot=5, port=17003)
