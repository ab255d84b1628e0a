from vln_imagine_tpu.envx.tables import WorldTables, EpisodeBatch, EnvState
from vln_imagine_tpu.envx.compiler import compile_world, ScanGraph
from vln_imagine_tpu.envx.synthetic import synthetic_world, synthetic_episodes
