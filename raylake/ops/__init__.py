from raylake.ops.append import append  # noqa: F401
from raylake.ops.compact import compact, plan_compaction  # noqa: F401
from raylake.ops.zorder import zorder, plan_zorder  # noqa: F401
from raylake.ops.merge import merge_into  # noqa: F401
from raylake.ops.expire import expire_snapshots  # noqa: F401
from raylake.ops.repartition import repartition_table  # noqa: F401
from raylake.ops.deletes import apply_deletes  # noqa: F401
from raylake.ops.update import update_where  # noqa: F401
from raylake.ops.delete_where import delete_where  # noqa: F401
from raylake.ops.clone import clone_table  # noqa: F401
from raylake.ops.maintain import run_with_retry  # noqa: F401
from raylake.ops.manifests import rewrite_manifests  # noqa: F401
from raylake.ops.add_files import add_files  # noqa: F401
from raylake.ops.overwrite import overwrite_partitions  # noqa: F401
