from .robot import RobotBall  # noqa: F401
from .dh_robot import DHRobot, IIWA14, UR10E, UR5E, ik_checked  # noqa: F401
