from .model import RobotModel, load_robot, from_parsed, PLANT_URDFS  # noqa: F401
from .urdf import parse_urdf, ParsedRobot  # noqa: F401
