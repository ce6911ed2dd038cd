"""Joint Spatial Division Multiplexing (JSDM) transmit weights for the
multi-user path.

Re-derives the behaviour of the out-of-repo MathWorks
``helperJSDMTransmitWeights`` (called when numUsers > 1,
``generate_maMIMO_LTF.m:429``; Adhikary et al., "Joint Spatial Division
and Multiplexing", IEEE TIT 2013): users are grouped (one group per
user, as the example notes), an analog pre-beamformer per user is built
from its channel covariance with the other users' dominant subspace
projected out (approximate block diagonalization), and per-user digital
weights equalize the user's own effective channel per subcarrier.

Everything is batched linear algebra (eigendecompositions + einsums) —
no per-user Python loops inside jit beyond the static user count.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def user_covariances(h_users) -> jnp.ndarray:
    """Per-user Tx-side channel covariance R_u = Σ_c Σ_r h h^H / C.

    Args:
      h_users: (U, C, Nt, Nr) per-user CSI.

    Returns:
      (U, Nt, Nt) Hermitian covariances.
    """
    h = jnp.asarray(h_users)
    return jnp.einsum("ucmr,ucnr->umn", h, jnp.conj(h)) / h.shape[1]


def jsdm_transmit_weights(
    h_users, num_sts: int = 1, int_rank: int | None = None
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Compute (Fbb list, mFrf) like helperJSDMTransmitWeights.

    Args:
      h_users: (U, C, Nt, Nr) per-user CSI estimates.
      num_sts: streams per user (numSTSVec entries — equal per user).
      int_rank: rank of the interference subspace nulled per user
        (default: num_sts × (U − 1)).

    Returns:
      fbb: list of U arrays (C, num_sts, num_sts) per-user digital
        weights (the block-diagonal entries packed by the caller,
        generate_maMIMO_LTF.m:432-438);
      m_frf: (U*num_sts, Nt) analog beamformer rows.
    """
    h = jnp.asarray(h_users, jnp.complex64)
    u_cnt, n_carr, nt, _ = h.shape
    covs = user_covariances(h)                        # (U, Nt, Nt)
    if int_rank is None:
        int_rank = num_sts * (u_cnt - 1)

    rows = []
    fbb = []
    eye = jnp.eye(nt, dtype=jnp.complex64)
    for u in range(u_cnt):
        # block diagonalization: project the user's covariance onto the
        # orthogonal complement of the OTHER users' dominant
        # (rank-int_rank) covariance subspace, then eigenbeam inside it.
        # (An earlier SLNR whitened-eig form — max b^H R_u b / b^H
        # (R_int+δI) b — over-nulled with EXACT CSI: it trades own-signal
        # gain against interference energy that the projection form
        # nulls for free, and measured 3–5 dB LOWER beamforming gain for
        # perfect CSI than for noisy LS CSI, inverting the BER ordering
        # at −10 dB. BD keeps full gain in the complement — scale
        # invariant, regularization free.)
        r_int = jnp.sum(covs, axis=0) - covs[u]
        _, v_int = jnp.linalg.eigh(r_int)
        u_int = v_int[:, nt - int_rank:]              # (Nt, int_rank)
        proj = eye - u_int @ u_int.conj().T
        r_proj = proj @ covs[u] @ proj.conj().T       # Hermitian
        _, v_a = jnp.linalg.eigh(r_proj)
        b_u = v_a[:, nt - num_sts:]                   # (Nt, num_sts)
        b_u = b_u / jnp.linalg.norm(b_u, axis=0, keepdims=True)
        rows.append(b_u.conj().T)                     # beamformer rows

        # per-carrier digital weights on the user's own effective block:
        # G_u(c) = B_u^T H_u(c)  -> (num_sts, Nr); matched/unitary weight
        g = jnp.einsum("ms,cmr->csr", jnp.conj(b_u), h[u])  # (C, sts, Nr)
        # SVD-free matched filter normalized per carrier
        gg = jnp.einsum("csr,ctr->cst", g, jnp.conj(g))     # (C, sts, sts)
        norm = jnp.sqrt(jnp.maximum(
            jnp.real(jnp.einsum("css->cs", gg)), 1e-30))
        # for num_sts==1 this reduces to a positive real scalar (power
        # of the effective channel), a valid per-carrier weight
        f_u = (jnp.conj(gg) / norm[..., None]).astype(jnp.complex64)
        fbb.append(f_u / jnp.maximum(
            jnp.abs(f_u).max(axis=(-2, -1), keepdims=True), 1e-30))

    m_frf = jnp.concatenate(rows, axis=0)             # (U*num_sts, Nt)
    return fbb, m_frf


def pack_block_diagonal(fbb: List[jnp.ndarray], num_sts: int):
    """Pack per-user Fbb blocks into the (C, sts_tot, sts_tot) steering
    matrix, transposed like the reference's `v`
    (generate_maMIMO_LTF.m:432-438)."""
    u_cnt = len(fbb)
    n_carr = fbb[0].shape[0]
    tot = u_cnt * num_sts
    steering = jnp.zeros((n_carr, tot, tot), jnp.complex64)
    for u in range(u_cnt):
        sl = slice(u * num_sts, (u + 1) * num_sts)
        steering = steering.at[:, sl, sl].set(fbb[u])
    return jnp.transpose(steering, (0, 2, 1))
