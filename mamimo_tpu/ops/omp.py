"""Orthogonal-matching-pursuit hybrid beamforming weights.

TPU-native reformulation of ``ompdecomp.m:105-116`` and
``omphybweights.m:169-203`` (El Ayach et al., "Spatially Sparse Precoding
in Millimeter Wave MIMO Systems", IEEE TWC 2014):

* the greedy loop runs a *static* ``max_sparsity`` iterations with a
  growing masked basis (jit-compatible: no data-dependent shapes); the
  masked normal-equation solve pads the Gram matrix with identity rows so
  unselected columns contribute exact zeros;
* the whole thing is vmapped over subcarriers — 234 independent
  decompositions become one batched matmul chain on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class OMPResult(NamedTuple):
    coeff: jnp.ndarray    # (S, Nw) digital weights
    atoms: jnp.ndarray    # (N, S) chosen dictionary atoms
    atom_idx: jnp.ndarray # (S,) indices into the dictionary
    err_norm: jnp.ndarray # () final residual Frobenius norm


def omp_decomp(wopt, adict, max_sparsity: int, norm_weight=None) -> OMPResult:
    """Decompose ``wopt ≈ atoms @ coeff`` with atoms from ``adict``.

    Mirrors ompdecomp.m: at step m pick the atom maximizing
    ``diag(Psi Psi^H)`` with ``Psi = A^H W r`` (:107-109), weighted-LS
    refit of all coefficients so far (:111), residual normalization
    (:112-114). Early convergence (err <= eps) freezes further updates.

    Args:
      wopt: (N, Nw) target (complex).
      adict: (N, Na) dictionary.
      max_sparsity: static number of atoms (NtRF).
      norm_weight: optional (N, N) W for the weighted norm.
    """
    wopt = jnp.asarray(wopt, jnp.complex64)
    adict = jnp.asarray(adict, jnp.complex64)
    n, nw = wopt.shape
    s_max = int(max_sparsity)
    W = (jnp.eye(n, dtype=jnp.complex64) if norm_weight is None
         else jnp.asarray(norm_weight, jnp.complex64))
    aw = adict.conj().T @ W                         # (Na, N), reused

    def step(carry, m):
        atoms, idx, res, err, coeff, done = carry
        psi = aw @ res
        score = jnp.sum(jnp.abs(psi) ** 2, axis=1)
        k = jnp.argmax(score)
        new_atoms = atoms.at[:, m].set(adict[:, k])
        new_idx = idx.at[m].set(k)
        mask = (jnp.arange(s_max) <= m)
        am = new_atoms * mask[None, :]
        gram = am.conj().T @ W @ am
        gram = gram + jnp.diag((~mask).astype(jnp.complex64))
        rhs = am.conj().T @ W @ wopt
        new_coeff = jnp.linalg.solve(gram, rhs)
        temp = wopt - am @ new_coeff
        new_err = jnp.linalg.norm(temp)
        new_res = temp / jnp.maximum(new_err, 1e-30)
        eps = jnp.asarray(jnp.finfo(jnp.float32).eps)
        upd = jnp.logical_not(done)
        atoms = jnp.where(upd, new_atoms, atoms)
        idx = jnp.where(upd, new_idx, idx)
        res = jnp.where(upd, new_res, res)
        err = jnp.where(upd, new_err, err)
        coeff = jnp.where(upd, new_coeff, coeff)
        done = jnp.logical_or(done, new_err <= eps)
        return (atoms, idx, res, err, coeff, done), None

    err0 = jnp.asarray(1.0, jnp.float32)
    init = (
        jnp.zeros((n, s_max), jnp.complex64),
        jnp.zeros((s_max,), jnp.int32),
        wopt,
        err0,
        jnp.zeros((s_max, nw), jnp.complex64),
        jnp.asarray(False),
    )
    (atoms, idx, _, err, coeff, _), _ = jax.lax.scan(
        step, init, jnp.arange(s_max)
    )
    return OMPResult(coeff, atoms, idx, err)


def omp_hyb_weights(h, ns: int, ntrf: int, at):
    """Hybrid precoding weights per subcarrier (omphybweights.m).

    Args:
      h: (L, Nt, Nr) channel estimates (comm convention).
      ns: number of data streams.
      ntrf: number of transmit RF chains.
      at: (Nt, Na) steering dictionary (same for all subcarriers, as the
        caller replicates it at generate_maMIMO_LTF.m:415-418).

    Returns:
      (fbb, frf): (L, ns, ntrf) baseband and (L, ntrf, Nt) RF weights.
    """
    h = jnp.asarray(h, jnp.complex64)

    def per_carrier(hc):
        # convert to [1] convention (omphybweights.m:173-175)
        H = hc.T                                     # (Nr, Nt)
        _, _, vh = jnp.linalg.svd(H, full_matrices=True)
        fopt = vh.conj().T[:, :ns]                   # (Nt, ns)
        r = omp_decomp(fopt, at, ntrf)
        frf = r.atoms                                # (Nt, ntrf)
        fbb = r.coeff                                # (ntrf, ns)
        scale = jnp.sqrt(jnp.asarray(float(ns))) / jnp.maximum(
            jnp.linalg.norm(frf @ fbb), 1e-30
        )
        fbb = fbb * scale
        # back to comm convention (:193-196)
        return fbb.T, frf.T                          # (ns,ntrf), (ntrf,Nt)

    return jax.vmap(per_carrier)(h)


def omp_hyb_combining(h, ns: int, ntrf: int, at, nrrf: int, ar, npow=0.0):
    """Full precoding + combining variant (omphybweights.m:180-202).

    Returns (fbb, frf, wbb, wrf) with shapes (L,ns,ntrf), (L,ntrf,Nt),
    (L,nrrf,ns), (L,Nr,nrrf).
    """
    h = jnp.asarray(h, jnp.complex64)
    nr = h.shape[2]

    def per_carrier(hc):
        H = hc.T                                     # (Nr, Nt)
        _, _, vh = jnp.linalg.svd(H, full_matrices=True)
        fopt = vh.conj().T[:, :ns]
        rp = omp_decomp(fopt, at, ntrf)
        frf, fbb = rp.atoms, rp.coeff
        fbb = fbb * jnp.sqrt(jnp.asarray(float(ns))) / jnp.maximum(
            jnp.linalg.norm(frf @ fbb), 1e-30
        )
        hf = H @ frf @ fbb                           # (Nr, ns)
        # MMSE combiner (omphybweights.m:181-183)
        gram = (fbb.conj().T @ frf.conj().T @ (H.conj().T @ H) @ frf @ fbb
                + npow * ns * jnp.eye(ns, dtype=jnp.complex64))
        wmmse = jnp.linalg.solve(
            gram, fbb.conj().T @ frf.conj().T @ H.conj().T
        ).conj().T                                   # (Nr, ns)
        ess = jnp.eye(ns, dtype=jnp.complex64) / ns
        eyy = hf @ ess @ hf.conj().T + npow * jnp.eye(nr, dtype=jnp.complex64)
        rc = omp_decomp(wmmse, ar, nrrf, norm_weight=eyy)
        wrf, wbb = rc.atoms, rc.coeff
        return fbb.T, frf.T, wbb.conj(), wrf.conj()

    return jax.vmap(per_carrier)(h)
