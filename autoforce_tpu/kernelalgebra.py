"""Composable base-kernel algebra over descriptor similarities.

Counterpart of the reference's ``regression/kernel.py`` (578 LoC:
``Kernel`` ops + ``Add/Sub/Mul/Pow/Exp``, ``White``, ``DotProd``,
``Normed``, ``SqD``, ``Stationary/RBF``, softplus ``Positive`` reparam,
``state`` serialization, gradient self-checks at kernel.py:509-574).

TPU-native shape: descriptors are unit-normalized, so every base kernel
is a scalar function of the dot product ``t = p·q`` in [-1, 1] — e.g.
``SqD = ||p-q||² = 2 - 2t`` and ``RBF = exp(-SqD/2l²) = exp((t-1)/l²)``.
A kernel expression is therefore a small immutable tree evaluated
pointwise on the Gram ``dot`` matrix.  That keeps the device code ONE
masked matmul + elementwise map (MXU-friendly), while users compose
arbitrary kernels exactly like the reference:

    expr = DotProd() ** 4 + 0.01 * White()
    expr = Exp(-(SqD() / Positive(0.5)))          # an RBF
    Engine(..., kernel=expr)

Expressions are frozen (hashable) so they ride through ``jax.jit`` as
static arguments.  ``value(t, xp=jnp)`` is jax-traceable (gradients of
trainable ``Positive`` parameters come from ``jax.grad`` through
``value_with_params``); pass ``xp=np`` for host math.  ``White`` is a
same-environment (true diagonal) term only — cross covariances never see
it, matching reference kernel.py's ``White.forward`` delta.

Serialization: ``expr.state`` is an eval-able constructor string
(reference ``state``/``state_args`` convention, similarity.py:79-85);
``from_state`` round-trips it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = [
    "KernelExpr", "DotProd", "Normed", "SqD", "Positive", "Const",
    "Add", "Mul", "Pow", "Exp", "White", "RBF", "from_state",
]


def softplus(x, xp):
    return xp.logaddexp(x, 0.0)


def inv_softplus(y):
    y = float(y)
    if y <= 0:
        raise ValueError("Positive parameter must be > 0")
    return float(np.log(np.expm1(y))) if y < 30 else y


def _wrap(x):
    if isinstance(x, KernelExpr):
        return x
    return Const(float(x))


@dataclass(frozen=True)
class KernelExpr:
    """Base node; subclasses define value(t, params, xp)."""

    # ---------------------------------------------------------- evaluation
    def value(self, t, xp=jnp):
        return self._value(t, self.params(), xp)

    def value_with_params(self, t, params, xp=jnp):
        """Evaluate with an explicit flat parameter tuple (differentiable
        wrt params — the reference's gradient path, kernel.py:509-574)."""
        return self._value(t, list(params), xp)

    def _value(self, t, params, xp):
        raise NotImplementedError

    def white_diag(self, xp=jnp):
        """Same-environment (i==i) additive variance of White terms."""
        return self._white(self.params(), xp)

    def _white(self, params, xp):
        # consume this subtree's parameters; no white contribution.
        # (White composes through Add/Mul; inside Pow/Exp it is ignored,
        # like the reference's additive-noise convention.)
        for _ in range(len(self.params())):
            params.pop(0)
        return 0.0

    # ---------------------------------------------------------- parameters
    def params(self):
        """Flat list of trainable parameter values (softplus free form)."""
        return []

    def with_params(self, params):
        """Rebuild the expression with a new flat parameter list."""
        expr, rest = self._rebuild(list(params))
        return expr

    def _rebuild(self, params):
        return self, params

    # ---------------------------------------------------------- operators
    def __add__(self, other):
        return Add(self, _wrap(other))

    __radd__ = __add__

    def __mul__(self, other):
        return Mul(self, _wrap(other))

    __rmul__ = __mul__

    def __pow__(self, n):
        return Pow(self, float(n))

    def __neg__(self):
        return Mul(Const(-1.0), self)

    def __sub__(self, other):
        return Add(self, -_wrap(other))

    def __truediv__(self, other):
        return Mul(self, Pow(_wrap(other), -1.0))

    # --------------------------------------------------------- persistence
    @property
    def state(self):
        raise NotImplementedError

    def __repr__(self):
        return self.state


@dataclass(frozen=True)
class Const(KernelExpr):
    c: float = 1.0

    def _value(self, t, params, xp):
        return self.c * xp.ones_like(t)

    @property
    def state(self):
        return f"Const({self.c!r})"


@dataclass(frozen=True)
class Positive(KernelExpr):
    """Trainable positive scalar, softplus-reparametrized
    (reference kernel.py Real/Positive free_form)."""

    v: float = 1.0

    def _value(self, t, params, xp):
        raw = params.pop(0)
        return softplus(raw, xp) * xp.ones_like(t)

    def params(self):
        return [inv_softplus(self.v)]

    def _rebuild(self, params):
        raw = params.pop(0)
        return Positive(float(np.logaddexp(raw, 0.0))), params

    @property
    def state(self):
        return f"Positive({self.v!r})"


@dataclass(frozen=True)
class DotProd(KernelExpr):
    def _value(self, t, params, xp):
        return t

    @property
    def state(self):
        return "DotProd()"


class Normed(DotProd):
    """Alias of DotProd on pre-normalized descriptors (reference Normed)."""

    @property
    def state(self):
        return "Normed()"


@dataclass(frozen=True)
class SqD(KernelExpr):
    """Squared descriptor distance ||p - q||^2 = 2 - 2 t on unit norms."""

    def _value(self, t, params, xp):
        return 2.0 - 2.0 * t

    @property
    def state(self):
        return "SqD()"


@dataclass(frozen=True)
class White(KernelExpr):
    """Same-environment noise: k(x, x') = signal^2 * delta(x is x')
    (reference kernel.py White; cross covariances never include it)."""

    signal: float = 1.0
    trainable: bool = False

    def _value(self, t, params, xp):
        if self.trainable:
            params.pop(0)
        return xp.zeros_like(t)

    def _white(self, params, xp):
        if self.trainable:
            return softplus(params.pop(0), xp) ** 2
        return self.signal**2

    def params(self):
        return [inv_softplus(self.signal)] if self.trainable else []

    def _rebuild(self, params):
        if self.trainable:
            raw = params.pop(0)
            return White(float(np.logaddexp(raw, 0.0)), True), params
        return self, params

    @property
    def state(self):
        return f"White({self.signal!r}, {self.trainable!r})"


@dataclass(frozen=True)
class Add(KernelExpr):
    a: KernelExpr = None
    b: KernelExpr = None

    def _value(self, t, params, xp):
        return self.a._value(t, params, xp) + self.b._value(t, params, xp)

    def _white(self, params, xp):
        return self.a._white(params, xp) + self.b._white(params, xp)

    def params(self):
        return self.a.params() + self.b.params()

    def _rebuild(self, params):
        a, params = self.a._rebuild(params)
        b, params = self.b._rebuild(params)
        return Add(a, b), params

    @property
    def state(self):
        return f"Add({self.a.state}, {self.b.state})"


@dataclass(frozen=True)
class Mul(KernelExpr):
    a: KernelExpr = None
    b: KernelExpr = None

    def _value(self, t, params, xp):
        return self.a._value(t, params, xp) * self.b._value(t, params, xp)

    def _white(self, params, xp):
        # (a + wa)(b + wb) diag extra: wa*b(1) + a(1)*wb + wa*wb
        pa = [params.pop(0) for _ in range(len(self.a.params()))]
        pb = [params.pop(0) for _ in range(len(self.b.params()))]
        wa = self.a._white(list(pa), xp)
        wb = self.b._white(list(pb), xp)
        a1 = self.a._value(xp.ones(()), list(pa), xp)
        b1 = self.b._value(xp.ones(()), list(pb), xp)
        return wa * (b1 + wb) + wb * a1

    def params(self):
        return self.a.params() + self.b.params()

    def _rebuild(self, params):
        a, params = self.a._rebuild(params)
        b, params = self.b._rebuild(params)
        return Mul(a, b), params

    @property
    def state(self):
        return f"Mul({self.a.state}, {self.b.state})"


@dataclass(frozen=True)
class Pow(KernelExpr):
    a: KernelExpr = None
    n: float = 1.0

    def _value(self, t, params, xp):
        return self.a._value(t, params, xp) ** self.n

    def params(self):
        return self.a.params()

    def _rebuild(self, params):
        a, params = self.a._rebuild(params)
        return Pow(a, self.n), params

    @property
    def state(self):
        return f"Pow({self.a.state}, {self.n!r})"


@dataclass(frozen=True)
class Exp(KernelExpr):
    a: KernelExpr = None

    def _value(self, t, params, xp):
        return xp.exp(self.a._value(t, params, xp))

    def params(self):
        return self.a.params()

    def _rebuild(self, params):
        a, params = self.a._rebuild(params)
        return Exp(a), params

    @property
    def state(self):
        return f"Exp({self.a.state})"


def RBF(lengthscale=1.0, trainable=False):
    """Stationary RBF on unit-norm descriptors:
    exp(-||p-q||^2 / 2l^2) = exp((t-1)/l^2) (reference stationary.py)."""
    if trainable:
        ell = Positive(lengthscale)
        return Exp(-(Mul(SqD(), Pow(Mul(Const(2.0), Mul(ell, ell)), -1.0))))
    c = 1.0 / (2.0 * lengthscale**2)
    return Exp(Mul(Const(-c), SqD()))


_NAMESPACE = {
    "Const": Const, "Positive": Positive, "DotProd": DotProd,
    "Normed": Normed, "SqD": SqD, "White": White, "Add": Add, "Mul": Mul,
    "Pow": Pow, "Exp": Exp, "RBF": RBF, "True": True, "False": False,
}


def from_state(state):
    """Rebuild an expression from its state string (reference
    `eval(state)` persistence, kernel.py:574 roundtrip check)."""
    return eval(state, {"__builtins__": {}}, _NAMESPACE)  # noqa: S307
