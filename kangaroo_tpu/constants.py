"""Global constants for the TPU-native Kangaroo solver.

Mirrors the semantic constants of the reference implementation
(reference: Constants.h) so that jump tables, distinguished points and
work files are bit-compatible.  None of the *implementation* choices of
the reference (group sizes, grids) are inherited here; TPU-side batch
shapes live in `kangaroo_tpu.ops`.
"""

RELEASE = "2.2-tpu"

# Number of random jumps in the jump table (reference: Constants.h:29).
NB_JUMP = 32

# Kangaroo types (reference: Constants.h:38-39).
TAME = 0
WILD = 1

# DP send period to server, seconds (reference: Constants.h:42).
SEND_PERIOD = 2.0

# Idle client timeout, seconds (reference: Constants.h:45).
CLIENT_TIMEOUT = 3600.0

# Number of merge partitions for partitioned work files
# (reference: Constants.h:48).
MERGE_PART = 256

# Hash table geometry (reference: HashTable.h:28-30).
HASH_SIZE_BIT = 18
HASH_SIZE = 1 << HASH_SIZE_BIT
HASH_MASK = HASH_SIZE - 1
H_PER_PART = HASH_SIZE // MERGE_PART

# Work file headers (reference: Kangaroo.h:120-122).
HEADW = 0xFA6A8001   # Full work file
HEADK = 0xFA6A8002   # Kangaroo only file
HEADKS = 0xFA6A8003  # Compressed kangaroo only file

# secp256k1 field prime p = 2^256 - 2^32 - 977 (reference: SECP256K1.cpp:29).
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
# Fold constant: p = 2^256 - K1_C.
K1_C = (1 << 256) - P  # == 0x1000003D1

# Curve order n (reference: SECP256K1.cpp:38).
N_ORDER = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

# Generator point (reference: SECP256K1.cpp:35-36).
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

# Fixed seed used for the jump table so work files stay compatible
# across runs and machines (reference: Kangaroo.cpp:760-761).
JUMP_TABLE_SEED = 0x600DCAFE

# Network protocol (reference: Network.cpp:41-58, main.cpp:161).
SERVER_VERSION = 3
DEFAULT_PORT = 17403
MAX_CLIENT = 256

# Limb geometry of the vectorized 256-bit field elements: 16 limbs of
# 16 bits stored in uint32 lanes, least-significant limb first.  Chosen
# for the TPU VPU: 16x16->32-bit products are exact in a uint32 lane.
NB_LIMB = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# Distance limbs: distances are carried on-device as 128-bit unsigned
# (wild kangaroos are offset by rangeWidth/2 to stay non-negative, like
# the reference GPU engine, GPUEngine.cu:381-433).
NB_LIMB_D = 8
