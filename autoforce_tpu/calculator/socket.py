"""ML <-> ab-initio process separation over TCP.

Counterpart of the reference's SocketCalculator / calc_server pair
(theforce/calculator/socketcalc.py, calc_server.py, util/server.py) with a
wire-compatible protocol: requests are ``in_path:out_path[:script]``
strings, structures travel as extxyz files, the server answers the return
code as text.  The DFT (or any oracle) process stays fully decoupled from
the TPU/ML process, exactly like the reference (SURVEY.md §2.2).
"""

from __future__ import annotations

import importlib.util
import os
import socket
import time

import numpy as np

from ..io.xyz import read_xyz, write_xyz
from ..system import SinglePointCalculator


class SocketCalculator:
    """TCP client; ships structures to a calc server."""

    def __init__(self, ip="localhost", port=6666, script=None, wlog=False):
        self.ip = ip
        self.port = port
        self.script = script
        self.wlog = wlog
        self.log("created", "w")

    def log(self, msg, mode="a"):
        if self.wlog:
            with open("socalc.log", mode) as f:
                f.write(f"{time.ctime()}   {msg}\n")

    def ping(self):
        s = socket.socket()
        s.connect((self.ip, self.port))
        s.send(b"?")
        out = s.recv(1024)
        s.close()
        return out

    @property
    def message(self):
        cwd = os.getcwd()
        msg = f"{cwd}/socket_send.xyz:{cwd}/socket_recv.xyz"
        if self.script is not None:
            msg = f"{msg}:{os.path.abspath(self.script)}"
        return msg

    def calculate(self, system):
        self.log("s")
        s = socket.socket()
        s.connect((self.ip, self.port))
        write_xyz("socket_send.xyz", system, forces=False)
        s.send(self.message.encode())
        ierr = int(s.recv(1024).decode("utf-8"))
        s.close()
        if ierr != 0:
            raise RuntimeError(
                "SocketCalculator failed! Check the ab initio server."
            )
        self.log("e")
        out = read_xyz("socket_recv.xyz", index=0)
        res = dict(out.calc.results)
        os.system("rm -f socket_send.xyz socket_recv.xyz")
        if "stress" not in res:
            res["stress"] = np.zeros(6)
        return res

    def close(self):
        s = socket.socket()
        s.connect((self.ip, self.port))
        s.send(b"end")
        s.close()


class Server:
    """Minimal TCP request loop (util/server.py:7-43)."""

    def __init__(self, ip, port, callback=None, args=(), wlog=False):
        self.socket = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.socket.bind((ip, port))
        self.callback = callback if callback else (lambda a: 0)
        self.args = args
        self.wlog = wlog

    def listen(self, end="end", ping="?"):
        self.socket.listen(5)
        resume = True
        while resume:
            c, addr = self.socket.accept()
            try:
                request = c.recv(1024).decode("utf-8").strip()
                if request == end:
                    resume = False
                elif request == ping:
                    c.send(b"!")
                else:
                    try:
                        self.callback(request, *self.args)
                        c.send(b"0")
                    except Exception:
                        # rc -1 to the client (reference util/server.py
                        # error path); keep the cause visible server-side
                        import traceback

                        traceback.print_exc()
                        c.send(b"-1")
            except OSError:
                # a client that vanished must not take the server down
                # (reference server keeps serving across bad requests)
                pass
            finally:
                c.close()
        self.socket.close()


_imported = {}


def _dotted_name(script):
    """Dotted module name when ``script`` lives inside this package (the
    file-location loader cannot resolve those modules' relative imports);
    None for arbitrary user scripts."""
    import autoforce_tpu

    pkg_dir = os.path.dirname(os.path.abspath(autoforce_tpu.__file__))
    path = os.path.abspath(script)
    if not path.startswith(pkg_dir + os.sep):
        return None
    rel = os.path.relpath(path, os.path.dirname(pkg_dir))
    if not rel.endswith(".py"):
        return None
    return rel[: -len(".py")].replace(os.sep, ".")


def get_scope(script):
    """Load {'calc', 'preprocess_atoms'?, 'postprocess_atoms'?} from a
    python script (module-import cache, calc_server.py:37-53)."""
    if script not in _imported:
        name = _dotted_name(script)
        if name is not None:
            # package adapters (vasp.py, gaussian.py, scripts/*.py) use
            # relative imports — import them as real modules
            mod = importlib.import_module(name)
        else:
            spec = importlib.util.spec_from_file_location(
                "_oracle_import", script
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        _imported[script] = mod
    mod = _imported[script]
    scope = {"calc": mod.calc}
    for hook in ("preprocess_atoms", "postprocess_atoms"):
        if hasattr(mod, hook):
            scope[hook] = getattr(mod, hook)
    return scope


def serve_request(request, calc=None):
    """Handle one 'in:out[:script[:ref]]' request (calc_server.py:56-86)."""
    scope = {}
    if ":" in request:
        parts = request.split(":")
        if len(parts) == 2:
            i, o = parts
        elif len(parts) >= 3:
            i, o, c = parts[:3]
            scope = get_scope(c)
            calc = scope["calc"]
        else:
            raise RuntimeError(f"bad request {request}")
    else:
        i = o = request
    with open(o, "w") as f:
        f.write(f"{time.ctime()} reserved\n")
    system = read_xyz(i, index=0)
    system.calc = calc
    if "preprocess_atoms" in scope:
        scope["preprocess_atoms"](system)
    res = {
        "energy": system.get_potential_energy(),
        "forces": system.get_forces(),
    }
    try:
        res["stress"] = system.get_stress()
    except Exception:
        pass
    if "postprocess_atoms" in scope:
        scope["postprocess_atoms"](system)
    system.calc = SinglePointCalculator(system, **res)
    write_xyz(o, system)


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Starts a calculation server.")
    parser.add_argument("-ip", "--ip", default="localhost")
    parser.add_argument("-port", "--port", type=int, default=6666)
    parser.add_argument("-calc", "--calculator", default=None)
    args = parser.parse_args()
    calc = get_scope(args.calculator)["calc"] if args.calculator else None
    Server(args.ip, args.port, callback=serve_request, args=(calc,)).listen()


if __name__ == "__main__":
    main()
