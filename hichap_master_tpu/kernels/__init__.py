from .pallas_ice import pallas_ice_sweeps, ice_balance_pallas
