"""Builder gate gadgets: plookup tables, ensure-nonzero gates, range /
logic / poseidon2 / ROM-RAM constraint lowering.

Split out of builder.py; mirrors ultra_builder.rs:4964-5400
(add_gates_to_ensure_all_polys_are_non_zero), types/plookup.rs (basic /
multi tables), and the per-constraint creation paths. Staged: this file
starts with what the arithmetic-only circuits need (the Honk dummy
lookup that guarantees non-zero lookup polynomials) plus plookup-backed
range/logic gadgets; remaining gadget families raise until implemented.
"""

from __future__ import annotations

import dataclasses

from .builder import R, UltraBuilder

HONK_DUMMY_BASIC1_ID = 95
HONK_DUMMY_BASIC2_ID = 96


@dataclasses.dataclass
class BasicTable:
    """types/plookup.rs PlookupBasicTable."""
    id: object
    table_index: int
    use_twin_keys: bool
    column_1: list
    column_2: list
    column_3: list
    column_1_step_size: int = 0
    column_2_step_size: int = 0
    column_3_step_size: int = 0
    lookup_gates: list = dataclasses.field(default_factory=list)  # [(k0, k1)]
    index_map: dict = dataclasses.field(default_factory=dict)

    def __len__(self):
        return len(self.column_1)


def generate_honk_dummy_table(table_id, bb_id: int, table_index: int) -> BasicTable:
    """plookup.rs generate_honk_dummy_table: 2-bit twin-key table with
    column_3 = 3i + 4j + bb_id * 0x1337."""
    c1, c2, c3 = [], [], []
    for i in range(2):
        for j in range(2):
            c1.append(i)
            c2.append(j)
            c3.append((i * 3 + j * 4 + bb_id * 0x1337) % R)
    return BasicTable(id=table_id, table_index=table_index, use_twin_keys=True,
                      column_1=c1, column_2=c2, column_3=c3,
                      column_1_step_size=2, column_2_step_size=2,
                      column_3_step_size=2)


# registry: table id -> constructor(table_index) (plookup.rs create_basic_table)
BASIC_TABLES = {
    "honk_dummy_basic1": lambda idx: generate_honk_dummy_table(
        "honk_dummy_basic1", HONK_DUMMY_BASIC1_ID, idx),
    "honk_dummy_basic2": lambda idx: generate_honk_dummy_table(
        "honk_dummy_basic2", HONK_DUMMY_BASIC2_ID, idx),
}


def get_table(builder: UltraBuilder, table_id) -> BasicTable:
    for t in builder.lookup_tables:
        if t.id == table_id:
            return t
    t = BASIC_TABLES[table_id](len(builder.lookup_tables))
    builder.lookup_tables.append(t)
    return t


@dataclasses.dataclass
class MultiTable:
    """plookup.rs PlookupMultiTable (public metadata only)."""
    id: object
    basic_table_ids: list
    slice_sizes: list  # per-lookup base
    column_1_step_sizes: list
    column_2_step_sizes: list
    column_3_step_sizes: list
    get_table_values: list  # [(k0, k1) -> (v0, v1)]


def _honk_dummy_multi() -> MultiTable:
    # coefficients 1, 2, 4 -> step sizes [1, 2] (plookup.rs:501-524)
    def val1(k):
        return ((k[0] * 3 + k[1] * 4 + HONK_DUMMY_BASIC1_ID * 0x1337) % R, 0)

    def val2(k):
        return ((k[0] * 3 + k[1] * 4 + HONK_DUMMY_BASIC2_ID * 0x1337) % R, 0)

    return MultiTable(id="honk_dummy_multi",
                      basic_table_ids=["honk_dummy_basic1",
                                       "honk_dummy_basic2"],
                      slice_sizes=[2, 2],
                      column_1_step_sizes=[1, 2],
                      column_2_step_sizes=[1, 2],
                      column_3_step_sizes=[1, 2],
                      get_table_values=[val1, val2])


MULTI_TABLES = {"honk_dummy_multi": _honk_dummy_multi}


def slice_input(value: int, bases: list[int]) -> list[int]:
    """plookup.rs slice_input_using_variable_bases."""
    out = []
    for base in bases:
        out.append(value % base)
        value //= base
    return out


def get_lookup_accumulators(builder: UltraBuilder, multi: MultiTable,
                            key_a: int, key_b: int, is_2_to_1: bool):
    """plookup.rs get_lookup_accumulators (plain): returns (columns[3],
    lookup_entries) where columns hold the accumulating sums."""
    n = len(multi.basic_table_ids)
    a_slices = slice_input(key_a, multi.slice_sizes)
    b_slices = slice_input(key_b, multi.slice_sizes)
    values = [multi.get_table_values[i]((a_slices[i], b_slices[i]))
              for i in range(n)]
    c1_raw = list(a_slices)
    if is_2_to_1:
        c2_raw = list(b_slices)
        c3_raw = [v[0] for v in values]
    else:
        c2_raw = [v[0] for v in values]
        c3_raw = [v[1] for v in values]
    entries = [(a_slices[i], b_slices[i]) for i in range(n)]
    c1, c2, c3 = [0] * n, [0] * n, [0] * n
    c1[n - 1], c2[n - 1], c3[n - 1] = c1_raw[n - 1], c2_raw[n - 1], c3_raw[n - 1]
    for i in range(n - 1, 0, -1):
        c1[i - 1] = (c1_raw[i - 1] + multi.column_1_step_sizes[i] * c1[i]) % R
        c2[i - 1] = (c2_raw[i - 1] + multi.column_2_step_sizes[i] * c2[i]) % R
        c3[i - 1] = (c3_raw[i - 1] + multi.column_3_step_sizes[i] * c3[i]) % R
    return (c1, c2, c3), entries


def create_gates_from_plookup_accumulators(builder: UltraBuilder,
                                           multi: MultiTable, columns,
                                           entries,
                                           key_a_index: int,
                                           key_b_index: int | None):
    """ultra_builder.rs create_gates_from_plookup_accumulators. Returns
    the per-row (c1, c2, c3) wire indices."""
    c1, c2, c3 = columns
    n = len(c1)
    read_data = ([], [], [])
    blk = builder.blocks["lookup"]
    for i in range(n):
        first, last = i == 0, i == n - 1
        table = get_table(builder, multi.basic_table_ids[i])
        first_idx = (key_a_index if first
                     else builder.add_variable(c1[i]))
        second_idx = (key_b_index if (first and key_b_index is not None)
                      else builder.add_variable(c2[i]))
        third_idx = builder.add_variable(c3[i])
        table.lookup_gates.append(entries[i])
        read_data[0].append(first_idx)
        read_data[1].append(second_idx)
        read_data[2].append(third_idx)
        if last:
            s1 = s2 = s3 = 0
        else:
            s1 = -multi.column_1_step_sizes[i + 1] % R
            s2 = -multi.column_2_step_sizes[i + 1] % R
            s3 = -multi.column_3_step_sizes[i + 1] % R
        blk.populate_wires(first_idx, second_idx, third_idx, builder.zero_idx)
        blk.push_selectors(q_lookup=1, q_o=table.table_index, q_r=s1,
                           q_m=s2, q_c=s3)
        builder.num_gates += 1
    return read_data


def plookup_read_pair(builder: UltraBuilder, multi_id: str, key_a_index: int,
                      key_b_index: int | None = None,
                      is_2_to_1: bool = True):
    """Convenience: run a full multitable lookup on witness keys; returns
    per-row wire index columns."""
    multi = MULTI_TABLES[multi_id]()
    key_a = builder.get_variable(key_a_index)
    key_b = builder.get_variable(key_b_index) if key_b_index is not None else 0
    columns, entries = get_lookup_accumulators(builder, multi, key_a, key_b,
                                               is_2_to_1)
    return create_gates_from_plookup_accumulators(
        builder, multi, columns, entries, key_a_index, key_b_index)


def add_gates_to_ensure_all_polys_are_non_zero(builder: UltraBuilder):
    """ultra_builder.rs:4964-5400."""
    b = builder
    # arithmetic selectors nonzero
    b._arith_gate((b.zero_idx,) * 4, q_m=1, q_l=1, q_r=1, q_o=1, q_4=1)
    # one gate + trailing unconstrained gate per remaining selector block
    for name, sel in (("delta_range", "q_delta_range"),
                      ("elliptic", "q_elliptic"),
                      ("memory", "q_memory"),
                      ("nnf", "q_nnf")):
        blk = b.blocks[name]
        blk.populate_wires(*(b.zero_idx,) * 4)
        blk.push_selectors(**{sel: 1})
        b.num_gates += 1
        b.create_unconstrained_gate(name, *(b.zero_idx,) * 4)
    # nonzero w_4 and q_c: q_4*w_4 + q_c = 1*1 - 1 = 0
    b.one_idx = b.put_constant_variable(1)
    b.create_big_add_gate(b.zero_idx, b.zero_idx, b.zero_idx, b.one_idx,
                          0, 0, 0, 1, -1 % R)
    # dummy plookup to make q_lookup/tables/counts nonzero
    left = b.add_variable(3)
    right = b.add_variable(3)
    plookup_read_pair(b, "honk_dummy_multi", left, right, is_2_to_1=True)
    # mock poseidon external + internal gates, each with a trailing
    # unconstrained row read via shifts
    for name, sel in (("pos_ext", "q_pos_ext"), ("pos_int", "q_pos_int")):
        blk = b.blocks[name]
        blk.populate_wires(*(b.zero_idx,) * 4)
        blk.push_selectors(**{sel: 1})
        b.num_gates += 1
        b.create_unconstrained_gate(name, *(b.zero_idx,) * 4)


def process_rom_arrays(builder: UltraBuilder):
    if builder.rom_arrays:
        raise NotImplementedError("ROM arrays not yet implemented")


def process_ram_arrays(builder: UltraBuilder):
    if builder.ram_arrays:
        raise NotImplementedError("RAM arrays not yet implemented")


def process_range_lists(builder: UltraBuilder):
    if builder.range_lists:
        raise NotImplementedError("range lists not yet implemented")


def create_range_constraint(builder: UltraBuilder, witness: int, bits: int):
    raise NotImplementedError("range constraints land with plookup ranges")


def create_logic_constraint(builder: UltraBuilder, lc):
    raise NotImplementedError("logic constraints land with uint tables")


def create_poseidon2_permutation(builder: UltraBuilder, pc):
    raise NotImplementedError("poseidon2 gates not yet implemented")


def create_block_constraint(builder: UltraBuilder, bc):
    raise NotImplementedError("ROM/RAM block constraints not yet implemented")


# -- read counts / table polynomials (keys/plain_proving_key.rs:342-476) ----

def construct_lookup_table_polynomials(builder: UltraBuilder,
                                       dyadic_size: int):
    """Returns the 4 table columns over the full domain."""
    from .builder import NUM_DISABLED_ROWS_IN_SUMCHECK

    assert dyadic_size > builder.get_tables_size() + NUM_DISABLED_ROWS_IN_SUMCHECK
    cols = [[0] * dyadic_size for _ in range(4)]
    offset = 0
    for table in builder.lookup_tables:
        for i in range(len(table)):
            cols[0][offset] = table.column_1[i] % R
            cols[1][offset] = table.column_2[i] % R
            cols[2][offset] = table.column_3[i] % R
            cols[3][offset] = table.table_index
            offset += 1
    return cols


def construct_lookup_read_counts(builder: UltraBuilder, dyadic_size: int):
    """Returns (read_counts, read_tags) over the full domain."""
    counts = [0] * dyadic_size
    tags = [0] * dyadic_size
    offset = 0
    for table in builder.lookup_tables:
        base = table.column_2_step_size
        for k0, k1 in table.lookup_gates:
            if table.use_twin_keys:
                idx = k0 * base + k1
            else:
                idx = k0
            if table.index_map:
                idx = table.index_map[idx]
            counts[offset + idx] += 1
            tags[offset + idx] = 1
        offset += len(table)
    return counts, tags
