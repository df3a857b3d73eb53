"""MCMC samplers (reference parity: /root/reference/src/mcmc/__init__.py)."""

from .metropolis import (
    MCMCSampler, BlockedMCMCSampler, MCMCHistory, Metropolis,
    ModifiedMetropolis, accept_scan, estimate_accept_rate,
)

__all__ = [
    "MCMCSampler", "BlockedMCMCSampler", "MCMCHistory", "Metropolis",
    "ModifiedMetropolis", "accept_scan", "estimate_accept_rate",
]
