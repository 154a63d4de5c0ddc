"""Calculation-server entry point (name parity with the reference:
``python -m autoforce_tpu.calculator.calc_server -calc script.py``).
Implementation lives in calculator/socket.py."""

from .socket import Server, get_scope, main, serve_request

if __name__ == "__main__":
    main()
